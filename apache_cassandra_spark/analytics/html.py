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

from apache_cassandra_spark.analytics.web import (
    TRACKING_PARAMS,
    canonicalize_url,
    extract_host,
    registrable_domain,
)

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
_HREF_RE = r"""(?i)<a\b[^>]*\bhref\s*=\s*["']([^"']+)["']"""


def decode_entities(text: Column) -> Column:
    """Decode the :data:`NAMED_ENTITIES` subset (literal ``replace``
    chain — no regex metacharacter risk). Numeric entities beyond
    ``&#39;`` are left as-is: they are rare enough in corpus filtering
    that decoding them belongs to the DOM-parse variant."""
    for entity, char in NAMED_ENTITIES:
        text = F.replace(text, F.lit(entity), F.lit(char))
    return text


def strip_markup(html: Column) -> Column:
    """Remove non-content blocks (``<script>``/``<style>`` with their
    bodies, comments) then all remaining tags, each replaced by one
    space so word boundaries survive ``<p>a</p><p>b</p>``. Entities are
    NOT decoded here — run :func:`decode_entities` after (that order is
    what keeps a literal ``&lt;`` from being eaten as a tag)."""
    c = F.regexp_replace(html, _SCRIPT_RE, " ")
    c = F.regexp_replace(c, _STYLE_RE, " ")
    c = F.regexp_replace(c, _COMMENT_RE, " ")
    return F.regexp_replace(c, _TAG_RE, " ")


def html_to_text(html: Column) -> Column:
    """Rendered text of an HTML document as one codegen expression
    chain: strip markup → decode entities → collapse whitespace runs to
    a single space → trim. Plain text passes through unchanged (no tags
    to strip) modulo the whitespace collapse."""
    c = decode_entities(strip_markup(html))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_title(html: Column) -> Column:
    """`<title>` text (first occurrence), entity-decoded and trimmed;
    empty string when the document has none."""
    return F.trim(decode_entities(F.regexp_extract(html, _TITLE_RE, 1)))


def extract_links(html: Column) -> Column:
    """All ``<a href="...">`` targets, in document order, as an
    ``array<string>`` of RAW href values (quoted with either quote
    style; unquoted hrefs are skipped — vanishingly rare and ambiguous
    to delimit). Resolution and canonicalization are
    :func:`resolve_link`'s job."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), 1)


def resolve_link(href: Column, base_url: Column) -> Column:
    """Resolve one href against the page URL, covering the three
    unambiguous forms: absolute (``scheme://…`` — kept as-is),
    protocol-relative (``//host/…`` — inherits the base scheme), and
    host-relative (``/path`` — inherits scheme and host). Path-relative
    hrefs (``../x``, ``x/y``) resolve to NULL: correct resolution needs
    RFC 3986 dot-segment handling, and a wrong join key is worse than a
    dropped edge in a corpus-scale link graph (contract documented, not
    silently mangled — same policy as ``web.canonicalize_url`` for
    non-absolute inputs)."""
    scheme = F.lower(F.regexp_extract(base_url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = extract_host(base_url, strip_www=False)
    return (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(scheme, F.lit("://"), host, href))
        .otherwise(F.lit(None).cast("string"))
    )


def with_page_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Append ``clean_text``, ``title``, ``n_links`` — the map-only
    projection a crawl-ingest pipeline runs once, after which every
    text operator consumes ``clean_text`` instead of markup."""
    h = F.col(html_col)
    return df.withColumns(
        {
            "clean_text": html_to_text(h),
            "title": extract_title(h),
            "n_links": F.size(extract_links(h)),
        }
    )


def outlink_graph(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
    include_internal: bool = False,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Domain-level link graph of a crawl: explode each page's resolved
    outlinks, canonicalize them, map both endpoints to registrable
    domains, and aggregate to one edge row per (src_domain, dst_domain)
    with ``n_links`` (link occurrences) and ``n_pages`` (distinct source
    pages). Intra-domain edges are dropped by default
    (``include_internal=True`` keeps them) — navigational self-links
    drown the cross-site signal rank algorithms want.

    Plan shape: map-only projection → generator explode (fan-out bounded
    by links-per-page) → one hash aggregate on the domain pair; the
    distinct-page count rides the same shuffle via Expand. No joins, no
    broadcasts — the page's own URL provides the src endpoint, so the
    edge list never self-joins the corpus."""
    resolved = resolve_link(F.explode(extract_links(F.col(html_col))), F.col(url_col))
    src_domain = registrable_domain(extract_host(F.col(url_col)))
    edges = (
        df.select(
            F.col(id_col).alias("_page"),
            src_domain.alias("src_domain"),
            resolved.alias("_target"),
        )
        .where(F.col("_target").isNotNull())
        .select(
            "_page",
            "src_domain",
            registrable_domain(
                extract_host(canonicalize_url(F.col("_target"), tracking_params=tracking_params))
            ).alias("dst_domain"),
        )
    )
    if not include_internal:
        edges = edges.where(F.col("src_domain") != F.col("dst_domain"))
    return (
        edges.groupBy("src_domain", "dst_domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
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
