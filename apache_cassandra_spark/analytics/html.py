"""HTML → text extraction for web-corpus pipelines: markup stripping,
entity decoding, title and link harvesting, and the domain-level outlink
graph those links induce.

Raw crawl data arrives as markup; every text operator downstream
(quality, lang-id, dedup, tokenization) wants the rendered text. This
module is that boundary, built the same way as :mod:`.web`: pure
``pyspark.sql.functions`` regexp/string expressions — no UDFs, no
Python in the hot path — chosen so the identical chain replays
byte-for-byte on any POSIX-regex engine (the DuckDB oracle mirrors it;
both Java regex and RE2 agree on every construct used here: inline
``(?is)`` flags, lazy ``.*?``, ``\\b``, and plain character classes).

Scale shape: :func:`html_to_text` / :func:`extract_title` /
:func:`extract_links` are map-only projections (one codegen stage, no
shuffle, no broadcast); :func:`outlink_graph` is one explode followed by
one hash aggregate on the (src_domain, dst_domain) pair —
crawl-of-any-size safe because fan-out is bounded by links-per-page and
the aggregate key is domain-level (low cardinality, power-law skew that
AQE's skew handling absorbs). :func:`domain_pagerank` feeds that edge
list to :mod:`.graph`'s integer-exact PageRank.

Extraction contract (the standard trade of regex-level extractors such
as the WET-file pipeline of Common Crawl): markup is assumed
well-formed enough that ``<[^>]*>`` brackets are tags — a LITERAL ``<``
in text must arrive as ``&lt;`` (which survives stripping and decodes
correctly because entity decoding runs AFTER tag removal). A full
DOM parse is a different cost class and belongs in a Pandas-UDF
variant; for corpus filtering the regex chain is the published norm.

Reference parity note: the reference fork has no markup machinery —
this family extends the engine for the LLM-pipeline mandate, upstream
of the :mod:`.web` URL operators it composes with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_cassandra_spark.analytics.web import extract_host, registrable_domain

#: named entities decoded by :func:`decode_entities`, in application
#: order. ``&amp;`` is deliberately LAST: decoding it earlier would
#: turn the double-escape ``&amp;lt;`` into ``&lt;`` and then falsely
#: into ``<`` — last-position amp is the standard single-pass decode
#: order for this subset.
NAMED_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]*>"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
#: anchor OPEN tags / whole CLOSED anchor elements. Hrefs are parsed
#: per-element with quote-specific patterns (below) instead of a mixed
#: ["']...["'] class — the mixed class truncates a double-quoted value
#: at its first apostrophe (href="it's" → "it"), a silent corruption.
#: Attribute names are anchored by a PRECEDING [\s"'] (whitespace or a
#: closing quote), not \b: RE2 has no lookbehind, and a bare \b lets
#: ``data-href``/``accept-charset``-style attributes impersonate the
#: real one. An anchor ELEMENT requires href in its open tag, so a
#: legacy href-less ``<a name="top">`` cannot swallow the next real
#: anchor into its body.
_A_TAG_RE = r"(?i)<a\b[^>]*>"
_ANCHOR_ELEM_RE = r"""(?is)<a\b[^>]*[\s"']href\s*=[^>]*>.*?</a>"""
_ANCHOR_BODY_RE = r"(?is)<a\b[^>]*>(.*)</a>"
_HREF_DQ_RE = r'(?i)[\s"\']href\s*=\s*"([^"]*)"'
_HREF_SQ_RE = r"(?i)[\s\"']href\s*=\s*'([^']*)'"
#: HTML-spec precedence: the plain ``lang`` attribute wins; XHTML's
#: ``xml:lang`` is the fallback (a TRUE language declaration, matched
#: by its own bounded pattern — ``data-lang`` matches neither)
#: value capture excludes '>' too: on an unclosed-quote page the match
#: must fail cleanly, not read a markup span through the tag boundary
_LANG_RE = r"""(?is)<html\b[^>]*[\s"']lang\s*=\s*["']([^"'>]+)["']"""
_XML_LANG_RE = r"""(?is)<html\b[^>]*xml:lang\s*=\s*["']([^"'>]+)["']"""
#: BOUNDED tag match — [^>]* stops at the first '>', matching in
#: O(tag), never spanning following markup. A '>' inside a quoted
#: attribute value therefore truncates the tag (the description
#: extracts as ''): the module-wide contract (_TAG_RE strips at the
#: first '>' too), and the safe trade for crawl HTML — an
#: attribute-token alternation that consumes quoted values whole reads
#: through unbalanced quotes into arbitrary following markup
#: (unclosed-quote pages are ENDEMIC in crawls) and its
#: alternation-under-star can stack-overflow Java regex on long tails.
_META_DESC_TAG_RE = (
    r"""(?is)<meta\b[^>]*[\s"']name\s*=\s*["']description["'][^>]*>"""
)
_CONTENT_DQ_RE = r'(?i)[\s"\']content\s*=\s*"([^"]*)"'
_CONTENT_SQ_RE = r"(?i)[\s\"']content\s*=\s*'([^']*)'"
_CHARSET_RE = r"""(?is)<meta\b[^>]*[\s"';]charset\s*=\s*["']?([A-Za-z0-9_-]+)"""


def _href_of(tag: Column) -> Column:
    """href value of one anchor tag string: double-quoted form wins,
    then single-quoted; empty when unquoted or absent (ambiguous to
    delimit / nothing to resolve). A '>' inside an href value must be
    percent-encoded (RFC 3986 reserves it) — the open tag was delimited
    at the first '>' before this ever runs."""
    return (
        F.when(tag.rlike(_HREF_DQ_RE), F.regexp_extract(tag, _HREF_DQ_RE, 1))
        .when(tag.rlike(_HREF_SQ_RE), F.regexp_extract(tag, _HREF_SQ_RE, 1))
        .otherwise(F.lit(""))
    )


def decode_entities(text: Column) -> Column:
    """Decode the :data:`NAMED_ENTITIES` subset (literal ``replace``
    chain — no regex metacharacter risk). Numeric entities beyond
    ``&#39;`` are left as-is: they are rare enough in corpus filtering
    that decoding them belongs to the DOM-parse variant."""
    for entity, char in NAMED_ENTITIES:
        text = F.replace(text, F.lit(entity), F.lit(char))
    return text


def strip_noncontent(html: Column) -> Column:
    """Remove the non-content blocks (``<script>``/``<style>`` with
    their bodies, and comments), each replaced by one space. This is the
    shared first pass of both text extraction AND link extraction — a
    commented-out or script-embedded ``<a href>`` is not a link on the
    page, so :func:`extract_links` must not see it."""
    c = F.regexp_replace(html, _SCRIPT_RE, " ")
    c = F.regexp_replace(c, _STYLE_RE, " ")
    return F.regexp_replace(c, _COMMENT_RE, " ")


def strip_markup(html: Column) -> Column:
    """Remove non-content blocks (via :func:`strip_noncontent`) then all
    remaining tags, each replaced by one space so word boundaries
    survive ``<p>a</p><p>b</p>``. Entities are NOT decoded here — run
    :func:`decode_entities` after (that order is what keeps a literal
    ``&lt;`` from being eaten as a tag)."""
    return F.regexp_replace(strip_noncontent(html), _TAG_RE, " ")


def html_to_text(html: Column) -> Column:
    """Rendered text of an HTML document as one codegen expression
    chain: strip non-content blocks, then :func:`clean_fragment`'s
    tag-strip → entity-decode → whitespace-collapse → trim (ONE shared
    implementation of that inner chain, so document-level and
    fragment-level rendering cannot drift). Plain text passes through
    unchanged (no tags to strip) modulo the whitespace collapse."""
    return clean_fragment(strip_noncontent(html))


def extract_title(html: Column) -> Column:
    """`<title>` text (first occurrence), entity-decoded and trimmed;
    empty string when the document has none."""
    return F.trim(decode_entities(F.regexp_extract(html, _TITLE_RE, 1)))


def extract_links(html: Column) -> Column:
    """All ``<a href="...">`` targets, in document order, as an
    ``array<string>`` of RAW href values: anchor OPEN tags are pulled
    first, then each tag's href parsed quote-aware (double- or
    single-quoted, so a value containing the OTHER quote char survives
    intact; unquoted hrefs are skipped — vanishingly rare and ambiguous
    to delimit). Anchors inside ``<script>``/``<style>``/comments are
    NOT links on the page and are excluded (:func:`strip_noncontent`
    runs first). ``<title>`` extraction deliberately stays on the raw
    document — a commented-out title is pathological, not worth three
    regex passes per row. Resolution and canonicalization are
    :func:`resolve_link`'s job."""
    tags = F.regexp_extract_all(strip_noncontent(html), F.lit(_A_TAG_RE), 0)
    return F.filter(F.transform(tags, _href_of), lambda h: h != "")


def resolve_link(href: Column, base_url: Column) -> Column:
    """Resolve one href against the page URL, covering the three
    unambiguous forms: absolute (``scheme://…`` — kept as-is),
    protocol-relative (``//host/…`` — inherits the base scheme), and
    host-relative (``/path`` — inherits scheme and host). Path-relative
    hrefs (``../x``, ``x/y``) resolve to NULL: correct resolution needs
    RFC 3986 dot-segment handling, and a wrong join key is worse than a
    dropped edge in a corpus-scale link graph (contract documented, not
    silently mangled — same policy as ``web.canonicalize_url`` for
    non-absolute inputs). A non-absolute ``base_url`` (no ``scheme://``)
    resolves absolute hrefs as normal but the two relative forms to
    NULL — there is no scheme/host to inherit, and concatenating empty
    parts would fabricate keys like ``://host/path``."""
    scheme = F.lower(F.regexp_extract(base_url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = extract_host(base_url, strip_www=False)
    relative_ok = scheme != ""
    return (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(relative_ok & href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(relative_ok & href.startswith("/"), F.concat(scheme, F.lit("://"), host, href))
        .otherwise(F.lit(None).cast("string"))
    )


def clean_fragment(fragment: Column) -> Column:
    """Rendered text of an already-noncontent-stripped markup fragment
    (anchor bodies, meta snippets): tag strip → entity decode →
    whitespace collapse → trim. The inner chain of :func:`html_to_text`
    without the script/style/comment pass."""
    c = decode_entities(F.regexp_replace(fragment, _TAG_RE, " "))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_lang(html: Column) -> Column:
    """Declared document language — the ``lang`` attribute of the
    ``<html>`` tag, falling back to XHTML's ``xml:lang`` when ``lang``
    is absent OR empty, lowercased (``en``, ``pt-br``); empty string
    when neither carries a value. Two deliberate nuances vs the WHATWG
    letter: a NON-EMPTY ``lang`` wins over ``xml:lang`` (spec
    precedence), but ``lang=""`` ("language unknown") does NOT shadow a
    concrete ``xml:lang`` — an empty declaration carries no signal, and
    this column is a prior, not a spec evaluator. A declared lang is a
    PRIOR for
    ``text.lang_id``, not ground truth (multilingual sites template it
    wrong constantly) — ship both columns and let the curation filter
    arbitrate. nullif/coalesce, not rlike-then-extract: one scan per
    pattern, and the fallback gate IS the extract's own success (a
    prefix-gated rlike diverges from the extract on empty/unclosed
    values)."""
    return F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(html, _LANG_RE, 1), F.lit("")),
            F.regexp_extract(html, _XML_LANG_RE, 1),
        )
    )


def extract_meta_description(html: Column) -> Column:
    """``<meta name="description" content="...">`` text, entity-decoded
    and trimmed; empty when absent. The FIRST description meta tag in
    document order is extracted — BOUNDED at the tag's first '>', per
    the module-wide contract (see :data:`_META_DESC_TAG_RE`). The '>'
    consequence depends on where it sits: in the content value of a
    name-first tag, the matched tag truncates and the description
    extracts as ''; in a content-FIRST tag, the '>' hides the name=
    token past the bound so that tag is invisible to the matcher
    entirely (a later well-formed duplicate then wins). Either
    attribute order works for values without '>'. The matched tag's
    content is then parsed quote-aware like :func:`_href_of` (a
    double-quoted
    description containing an apostrophe — "Bob's site" — must not
    truncate at it; tag-first extraction keeps first-occurrence
    semantics even when a later duplicate meta uses the other quote
    style — and STRICTLY: a first tag with unquoted/unparseable content
    yields '', it does not fall through to a later tag). Raw-document
    match, like :func:`extract_title`."""
    tag = F.regexp_extract(html, _META_DESC_TAG_RE, 0)
    raw = F.when(
        tag.rlike(_CONTENT_DQ_RE), F.regexp_extract(tag, _CONTENT_DQ_RE, 1)
    ).otherwise(F.regexp_extract(tag, _CONTENT_SQ_RE, 1))
    return F.trim(decode_entities(raw))


def extract_charset(html: Column) -> Column:
    """Declared charset, lowercased: matches both the HTML5
    ``<meta charset=utf-8>`` form (quoted or bare) and the value inside
    the legacy http-equiv ``content="text/html; charset=..."`` form,
    because the regex keys on the ``charset=`` token either way."""
    return F.lower(F.regexp_extract(html, _CHARSET_RE, 1))


def anchor_pairs(html: Column) -> Column:
    """``array<struct<href,anchor>>`` of a page's closed, quoted-href
    anchors in document order — href RAW (resolution is
    :func:`resolve_link`'s job) and quote-aware via :func:`_href_of`,
    anchor text rendered via :func:`clean_fragment` (nested markup
    stripped, entities decoded). Whole ``<a ...>...</a>`` elements are
    extracted first, then each element parsed — href and body come from
    the SAME match site, aligned by construction. Unclosed anchors
    match nothing and unquoted/absent hrefs drop (same honesty policy
    as :func:`extract_links`)."""
    elems = F.regexp_extract_all(strip_noncontent(html), F.lit(_ANCHOR_ELEM_RE), 0)
    pairs = F.transform(
        elems,
        # href parsed from the OPEN TAG only — an href-bearing tag
        # nested in the anchor body must not shadow the anchor's own
        lambda e: F.struct(
            _href_of(F.regexp_extract(e, _A_TAG_RE, 0)).alias("href"),
            clean_fragment(F.regexp_extract(e, _ANCHOR_BODY_RE, 1)).alias("anchor"),
        ),
    )
    return F.filter(pairs, lambda p: p.getField("href") != "")


def anchor_text_corpus(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """The anchor-text side corpus: one row per (page, resolved target,
    anchor text) — what link-context pretraining data and anchor-based
    document expansion consume. Empty anchor texts (image links, styled
    spans that render to nothing) and unresolvable targets drop.

    Plan shape: map-only projection → one explode; no shuffle, no joins
    (the output is a corpus, not an aggregate — callers group it)."""
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("_base"),
        F.explode(anchor_pairs(F.col(html_col))).alias("_p"),
    )
    return (
        pairs.select(
            "doc_id",
            resolve_link(F.col("_p.href"), F.col("_base")).alias("target_url"),
            F.col("_p.anchor").alias("anchor_text"),
        )
        .where(F.col("target_url").isNotNull() & (F.col("anchor_text") != ""))
    )


#: memoized page-text expression quads, keyed by html_col — the
#: web.py _URL_KEY_COLS discipline: the four chains are pure functions
#: of the column name, cost ~380 py4j constructor RPCs to build, and
#: the composed crawl operators re-instantiate this projection per
#: invocation. Column objects are immutable expression wrappers, safe
#: to reuse across DataFrames.
_PAGE_TEXT_COLS: dict[str, dict[str, Column]] = {}


def with_page_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``clean_text``, ``title``, ``n_links``, ``declared_lang``
    — the map-only projection a crawl-ingest pipeline runs once, after
    which every text operator consumes ``clean_text`` instead of
    markup (and ``text.lang_id`` gets its declared-language prior)."""
    cols = _PAGE_TEXT_COLS.get(html_col)
    if cols is None:
        h = F.col(html_col)
        cols = {
            "clean_text": html_to_text(h),
            "title": extract_title(h),
            "n_links": F.size(extract_links(h)),
            "declared_lang": extract_lang(h),
        }
        _PAGE_TEXT_COLS[html_col] = cols
    return df.withColumns(cols
    )


#: block boundaries for main-content extraction: any block-level open or
#: close tag starts a new text block (inline tags — <a>, <b>, <span> —
#: stay inside their block, which is what lets link density be computed
#: per block)
_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|table|thead|tbody|tr|td|th"
    r"|section|article|header|footer|nav|aside|blockquote|pre|form|dl|dt|dd|br|hr)\b[^>]*>"
)
#: every anchor BODY in a fragment (non-greedy per element — the greedy
#: _ANCHOR_BODY_RE is for a single already-isolated element)
_ANCHOR_BODIES_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def block_features(html: Column) -> Column:
    """``array<struct<text,words,link_words>>`` of a page's non-empty
    text blocks — the shallow text features of Kohlschütter, Fankhauser
    & Nejdl, "Boilerplate Detection Using Shallow Text Features"
    (WSDM 2010): split at block-level tag boundaries, then per block the
    rendered text, its word count, and the word count of anchor bodies
    (the numerator of link density). All integer-exact, all computed
    INSIDE the array (transform before any consumer — the outlink_graph
    64 KB-codegen lesson), map-only, no UDF."""
    blocks = F.split(strip_noncontent(html), _BLOCK_SPLIT_RE)
    # two-stage transform: the regex-heavy clean_fragment chains run ONCE
    # per block into a materialized struct; the word counts then read the
    # MATERIALIZED fields. A single-stage struct would inline the whole
    # cleaning chain again inside each count's CASE WHEN (measured 3x
    # expression blowup — the outlink_graph 64 KB-codegen lesson applied
    # within an array).
    texts = F.transform(
        blocks,
        lambda b: F.struct(
            clean_fragment(b).alias("text"),
            clean_fragment(
                F.array_join(F.regexp_extract_all(b, F.lit(_ANCHOR_BODIES_RE), 1), " ")
            ).alias("_lt"),
        ),
    )
    feats = F.transform(
        texts,
        lambda s: F.struct(
            s.getField("text").alias("text"),
            F.when(s.getField("text") == "", F.lit(0))
            .otherwise(F.size(F.split(s.getField("text"), " ")))
            .alias("words"),
            F.when(s.getField("_lt") == "", F.lit(0))
            .otherwise(F.size(F.split(s.getField("_lt"), " ")))
            .alias("link_words"),
        ),
    )
    return F.filter(feats, lambda s: s.getField("text") != "")


def main_content(
    html: Column,
    min_words: int = 8,
    link_density: tuple[int, int] = (1, 3),
) -> Column:
    """Main-content text of a page: the concatenation of blocks that
    pass the densitometric content rule — at least ``min_words`` words
    AND link density ≤ ``num/den`` (evaluated as the exact integer
    inequality ``den·link_words <= num·words``, so every engine agrees
    on the boundary). Navigation bars, sidebars, footers and "related
    links" boxes are short and link-dense, so they fall out; body
    paragraphs survive. This is the simplified block classifier of the
    WSDM 2010 densitometric family (the full classifier adds
    neighbouring-block context — a documented possible refinement, not
    silent scope). Map-only codegen; composes ahead of
    ``dedup.remove_domain_boilerplate``, which then removes what
    density can't see (site templates that LOOK like content)."""
    num, den = link_density
    keep = F.filter(
        block_features(html),
        lambda s: (s.getField("words") >= min_words)
        & (den * s.getField("link_words") <= num * s.getField("words")),
    )
    return F.array_join(F.transform(keep, lambda s: s.getField("text")), " ")


def with_main_content(
    df: DataFrame,
    html_col: str = "html",
    min_words: int = 8,
    link_density: tuple[int, int] = (1, 3),
) -> DataFrame:
    """Append ``main_text``, ``n_blocks``, ``n_content_blocks`` — the
    block-classifier projection; one map-only pass like
    :func:`with_page_text` (whose ``clean_text`` keeps EVERYTHING —
    use that for link/lang analysis, this for corpus text).

    The feature array is staged through its own projection so the three
    outputs read ONE materialized ``_feats`` instead of re-deriving the
    block chain each (CollapseProject leaves a multiply-referenced
    non-cheap alias staged — the expression-sharing half of the
    64 KB-codegen lesson)."""
    num, den = link_density
    keep = F.filter(
        F.col("_feats"),
        lambda s: (s.getField("words") >= min_words)
        & (den * s.getField("link_words") <= num * s.getField("words")),
    )
    return (
        df.withColumn("_feats", block_features(F.col(html_col)))
        .withColumns(
            {
                "main_text": F.array_join(
                    F.transform(keep, lambda s: s.getField("text")), " "
                ),
                "n_blocks": F.size(F.col("_feats")),
                "n_content_blocks": F.size(keep),
            }
        )
        .drop("_feats")
    )


def outlink_graph(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
    include_internal: bool = False,
) -> DataFrame:
    """Domain-level link graph of a crawl: explode each page's resolved
    outlinks, map both endpoints to registrable domains, and aggregate
    to one edge row per (src_domain, dst_domain) with ``n_links`` (link
    occurrences) and ``n_pages`` (distinct source pages). Intra-domain
    edges are dropped by default (``include_internal=True`` keeps
    them) — navigational self-links drown the cross-site signal rank
    algorithms want. Pages whose own URL is not absolute contribute no
    edges (their src endpoint is unknowable — see :func:`resolve_link`).

    The dst endpoint goes straight through ``extract_host`` — full URL
    canonicalization (query-param sort, tracker strip) is deliberately
    skipped because a domain-level edge depends only on the host, and
    :func:`extract_host` applies the same host normalization
    (lowercase, default-port strip, ``www.`` strip) that
    ``canonicalize_url`` would; skipping it removes a multi-regex chain
    per link occurrence.

    Plan shape, chosen to keep every stage inside whole-stage codegen:
    hrefs are resolved INSIDE the link array (``transform`` before
    ``explode``), so the resolved target is a materialized generator
    output — naively composing ``registrable_domain(extract_host(
    resolve_link(...)))`` per exploded row inlines into a >64 KB codegen
    method, which Spark abandons for interpreted eval with no
    subexpression sharing. The first aggregate then dedups on the RAW
    host pair + page (one shuffle over the link fan-out, map-side
    combined), and the host→registrable-domain mapping runs AFTER it,
    over materialized host attributes on the already-tiny edge list; the
    final distinct aggregate (two cheap shuffles) regroups by domain.
    No joins, no broadcasts — the page's own URL provides the src
    endpoint, so the edge list never self-joins the corpus."""
    exploded = df.select(
        F.col(id_col).alias("_page"),
        extract_host(F.col(url_col)).alias("_src_host"),
        F.explode(
            F.transform(
                extract_links(F.col(html_col)),
                lambda h: resolve_link(h, F.col(url_col)),
            )
        ).alias("_target"),
    )
    # an empty _src_host (non-absolute page URL) has no src endpoint;
    # NULL _target is an unresolvable href — both drop here
    host_pairs = (
        exploded.where(F.col("_target").isNotNull() & (F.col("_src_host") != ""))
        .select("_page", "_src_host", extract_host(F.col("_target")).alias("_dst_host"))
        .groupBy("_src_host", "_dst_host", "_page")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    edges = host_pairs.select(
        registrable_domain(F.col("_src_host")).alias("src_domain"),
        registrable_domain(F.col("_dst_host")).alias("dst_domain"),
        "_page",
        "_n",
    )
    if not include_internal:
        # the `_n < 0` disjunct is always false (count(1) >= 1); it is
        # here to ANCHOR the predicate to the first aggregate's output:
        # a pure src != dst filter is a deterministic function of the
        # grouping keys, so Catalyst pushes it below the aggregate onto
        # the raw link rows — re-inlining the full registrable-domain
        # regex chains per link and regenerating the >64 KB codegen
        # method the host-first staging exists to avoid. It must be a
        # single OR predicate (an AND conjunct is split and the halves
        # pushed independently); referencing the aggregate result pins
        # evaluation to the (tiny) post-aggregate edge list.
        edges = edges.where((F.col("src_domain") != F.col("dst_domain")) | (F.col("_n") < 0))
    return (
        edges.groupBy("src_domain", "dst_domain")
        .agg(
            F.sum("_n").alias("n_links"),
            F.count_distinct("_page").alias("n_pages"),
        )
    )


def domain_pagerank(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
    iters: int = 3,
) -> DataFrame:
    """Domain authority from crawl structure: PageRank over the
    :func:`outlink_graph` edge list, weighted by distinct linking pages
    (``n_pages`` — page-weighting resists single-page link farms better
    than raw link counts). Returns :mod:`.graph`'s integer-exact
    ``(node, rank_micro)``; node is the registrable domain. This is the
    corpus-quality prior (a la Common Crawl's harmonic-centrality
    ranks) that :mod:`.web`'s ``domain_stats`` joins against when
    selecting sites for a training mix."""
    from apache_cassandra_spark.analytics.graph import pagerank

    edges = outlink_graph(df, html_col=html_col, url_col=url_col, id_col=id_col)
    return pagerank(edges, src_col="src_domain", dst_col="dst_domain", weight_col="n_pages", iters=iters)
