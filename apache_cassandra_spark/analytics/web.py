"""URL / domain operators for web-corpus pipelines: canonicalization,
host + registrable-domain extraction, domain-level rollups and URL dedup.

The first thing a web-corpus user reaches for after document-level dedup
is "group my crawl by site": canonicalize each URL (so tracking params
and case noise don't split a site into thousands of spurious keys), map
it to its *registrable* domain (``foo.co.uk``, not ``co.uk`` and not
``a.b.foo.co.uk``), then aggregate or dedup per domain.

Everything here is pure ``pyspark.sql.functions`` expressions — regexp
chains, array ops, string splits — so the whole path stays inside
whole-stage codegen and is byte-replayable by any POSIX-regex engine
(the DuckDB oracle mirrors the identical chain). No UDFs, no shuffles in
the per-row operators: ``canonicalize_url`` / ``extract_host`` /
``registrable_domain`` are map-only; ``domain_stats`` is one hash
aggregate on the (low-cardinality) domain key; ``dedup_urls`` is one
hash aggregate on the canonical URL — both the uniform-key single
shuffle shape that holds at 100 TB.

Reference parity note: the reference fork has no URL machinery — this
family extends the engine for the LLM-pipeline mandate (the same role
``contrib/pig/example-script.pig:1-8``'s group/count/order plays for
word counts, lifted to registrable domains).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: multi-label public suffixes the heuristic recognizes (a deliberately
#: small embedded subset of the Mozilla Public Suffix List — the full
#: PSL is a data artifact a production deployment would load the same
#: way the BPE merge table is loaded; the *algorithm* is identical:
#: registrable domain = one label more than the longest matching suffix)
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "co.jp",
    "ne.jp",
    "or.jp",
    "com.au",
    "net.au",
    "org.au",
    "co.in",
    "co.nz",
    "co.za",
    "com.br",
    "com.cn",
    "com.mx",
)

#: exact query-parameter names stripped by canonicalization (click / session
#: trackers that never change page content). Deliberately NOT included:
#: bare ``ref`` — on many origins (?ref=<branch>, ?ref=<forum-thread>) it
#: selects different content, so collapsing it would make ``dedup_urls``
#: drop non-duplicate documents. Corpora that know their ``ref`` is a
#: tracker pass their own set via ``canonicalize_url(tracking_params=…)``.
TRACKING_PARAMS: tuple[str, ...] = (
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref_src",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


#: memoized url-key expression triples, keyed by
#: (url_col, strip_www, tracking_params) — see with_url_keys
_URL_KEY_COLS: dict[tuple, dict[str, Column]] = {}


def _is_tracking(param: Column, tracking_params: tuple[str, ...]) -> Column:
    """True when a single ``k=v`` query token is tracker noise."""
    key = F.split(param, "=").getItem(0)
    return key.startswith("utm_") | key.isin(*tracking_params) | (param == "")


def canonicalize_url(
    url: Column,
    strip_www: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of an absolute http(s) URL, as one codegen
    expression chain:

    - trim surrounding whitespace; strip the ``#fragment``
    - lowercase the scheme and the host (path/query case is preserved —
      paths are case-sensitive on most origins)
    - drop the default port (``:80`` for http, ``:443`` for https)
    - drop a leading ``www.`` label (``strip_www=False`` to keep it)
    - remove tracking parameters (``utm_*`` prefixes plus the
      ``tracking_params`` set, default :data:`TRACKING_PARAMS`), sort
      the survivors byte-wise, and re-join — ``?b=2&a=1`` and
      ``?a=1&b=2`` canonicalize identically
    - normalize an empty path to ``/``

    Non-absolute inputs (no ``scheme://``) are returned trimmed but
    otherwise untouched — canonicalization is only defined for absolute
    URLs, and silently mangling relative ones would corrupt joins.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    # _REST_RE's group excludes '#', so the fragment is gone already
    rest = F.regexp_extract(u, _REST_RE, 1)

    host = F.when(scheme == "http", F.regexp_replace(hostport, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", "")).otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)", 1)
    kept = F.array_sort(F.filter(F.split(query, "&"), lambda p: ~_is_tracking(p, tracking_params)))
    qtail = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))

    canon = F.concat(scheme, F.lit("://"), host, path, qtail)
    return F.when(scheme == "", u).otherwise(canon)


def surt(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform key — the Internet
    Archive / Common Crawl URL-index convention (public: the IA
    ``surt`` library, CC's cdx index layout): a key that sorts all of
    one registrable domain's URLs (and its subdomains') contiguously,
    so an index range scan answers "everything under example.com".

    Documented subset of the IA canonicalizer: lowercase the whole
    key; drop the scheme; drop the default port (non-default ports
    stay, appended to the reversed host — a different origin); strip
    one leading ``www.`` label; REVERSE the host labels and comma-join
    them; append ``)`` + path (empty → ``/``) + the byte-sorted query
    (empty params dropped, all others KEPT — the index key must be
    reproducible from the URL alone, so no tracking-param stripping
    here; strip trackers BEFORE indexing if the corpus wants that).
    ``https://www.Example.com:443/A/b?b=2&a=1`` →
    ``com,example)/a/b?a=1&b=2``. Non-absolute input → NULL (an index
    key for a relative URL is meaningless).

    One codegen expression chain over the same anchored regexes as
    :func:`canonicalize_url` — the two key spaces cannot drift on
    scheme/host/port handling."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    rest = F.regexp_extract(u, _REST_RE, 1)
    hp = F.when(scheme == "http", F.regexp_replace(hostport, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", "")).otherwise(hostport)
    )
    hp = F.regexp_replace(hp, r"^www\.", "")
    port = F.regexp_extract(hp, r":(\d+)$", 1)
    host = F.regexp_replace(hp, r":\d+$", "")
    rhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    keyhost = F.when(port != "", F.concat(rhost, F.lit(":"), port)).otherwise(rhost)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)", 1)
    kept = F.array_sort(F.filter(F.split(query, "&"), lambda p: p != ""))
    qtail = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    key = F.lower(F.concat(keyhost, F.lit(")"), path, qtail))
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(key)


def extract_host(url: Column, strip_www: bool = True) -> Column:
    """Lowercased host of an absolute URL, default port (``:80`` for
    http, ``:443`` for https — non-default ports are KEPT, they address
    a different origin) and (by default) leading ``www.`` removed; empty
    string for non-absolute inputs. Same scheme-conditional chain as
    :func:`canonicalize_url`, so the ``host``/``domain`` columns never
    disagree with the host embedded in ``canonical_url``.
    (Spark's ``parse_url(url, 'HOST')`` is the builtin alternative; the
    explicit regex is used so the DuckDB oracle replays it verbatim.)"""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = F.when(scheme == "http", F.regexp_replace(hostport, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", "")).otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


class PublicSuffixList:
    """A parsed Mozilla Public Suffix List (publicsuffix.org — the
    public data artifact; format: one rule per line, ``//`` comments,
    ``*.`` wildcard rules that match exactly one extra label,
    ``!`` exception rules that carve a registrable domain back out of a
    wildcard). Holds three frozensets the matching expression probes
    with O(1) ``InSet`` lookups:

    - ``exact``  — plain rules (``co.uk``, ``pvt.k12.ma.us``)
    - ``wild``   — wildcard BASES (``kawasaki.jp`` for ``*.kawasaki.jp``)
    - ``exc``    — exception rules sans ``!`` (``city.kawasaki.jp``) —
      by the PSL algorithm an exception IS a registrable domain

    The private-domain section (``amazonaws.com`` and friends) loads
    like any other rules — pass ``icann_only=True`` to stop at the
    ``// ===BEGIN PRIVATE DOMAINS===`` marker."""

    def __init__(self, exact, wild, exc):
        self.exact = frozenset(exact)
        self.wild = frozenset(wild)
        self.exc = frozenset(exc)
        lens = (
            [r.count(".") + 1 for r in self.exact]
            + [b.count(".") + 2 for b in self.wild]
            + [e.count(".") + 1 for e in self.exc]
        )
        self.max_labels = max(lens, default=1)

    @classmethod
    def parse(cls, text: str, icann_only: bool = False) -> "PublicSuffixList":
        exact, wild, exc = [], [], []
        for line in text.splitlines():
            if icann_only and line.startswith("// ===BEGIN PRIVATE DOMAINS==="):
                break
            rule = line.strip().split()[0] if line.strip() else ""
            if not rule or rule.startswith("//"):
                continue
            rule = rule.lower().lstrip(".")
            if rule.startswith("!"):
                exc.append(rule[1:])
            elif rule.startswith("*."):
                wild.append(rule[2:])
            elif rule == "*":
                pass  # the implicit default rule — already the fallback
            else:
                exact.append(rule)
        return cls(exact, wild, exc)

    @classmethod
    def load(cls, path: str, icann_only: bool = False) -> "PublicSuffixList":
        """Load from a local ``public_suffix_list.dat`` artifact (ship it
        with the job like the BPE merge table; no network fetch here)."""
        with open(path, encoding="utf-8") as fh:
            return cls.parse(fh.read(), icann_only=icann_only)


#: the embedded two-label subset, expressed as a PublicSuffixList — the
#: default when no full artifact is supplied (and the shape the DuckDB
#: gate oracles replay)
EMBEDDED_PSL = PublicSuffixList(MULTI_SUFFIXES, (), ())


def registrable_domain(host: Column, psl: PublicSuffixList | None = None) -> Column:
    """Registrable ("eTLD+1") domain of a host: one label more than the
    longest matching public suffix — ``a.b.foo.co.uk`` → ``foo.co.uk``,
    ``news.example.com`` → ``example.com``; a bare suffix or
    single-label host is returned whole.

    With the default ``psl=None``, suffix matching uses the embedded
    :data:`MULTI_SUFFIXES` two-label subset — the exact expression the
    gate oracles replay. Pass a loaded :class:`PublicSuffixList` for
    full-PSL semantics: longest-match across plain rules, ``*.``
    wildcards (under ``*.kawasaki.jp`` the public suffix of
    ``x.a.b.kawasaki.jp`` is ``b.kawasaki.jp``, so its registrable
    domain is ``a.b.kawasaki.jp``) and ``!`` exceptions
    (``sub.city.kawasaki.jp`` → ``city.kawasaki.jp``).

    Either way the result is pure array/set expressions — map-only,
    codegen, no UDF, no join: the rule sets compile to ``InSet`` hash
    probes (O(1) per row regardless of the ~9k-rule list size), so the
    full PSL rides the task binary instead of a broadcast join that
    would change every caller's plan shape."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    if psl is None:
        last2 = F.concat_ws(".", F.get(labels, n - 2), F.get(labels, n - 1))
        take = F.when((n >= 3) & last2.isin(*MULTI_SUFFIXES), F.lit(3)).otherwise(F.lit(2))
        take = F.least(take, n)
        return F.array_join(F.slice(labels, n - take + 1, take), ".")

    def last_k(k: int) -> Column:
        # total function: '' (never a rule) when the host is shorter than
        # k labels — slice() raises on start<=0 and negative starts count
        # from the END, so the guard must live INSIDE the expression, not
        # rely on And short-circuiting around it
        return F.when(
            n >= k, F.array_join(F.slice(labels, n - k + 1, k), ".")
        ).otherwise(F.lit(""))

    # partition the rule sets by suffix label count: an s-label string can
    # only ever equal an s-label rule, so probing the FULL ~9k-rule set at
    # every length would serialize ~5 needless InSet copies into the task
    # binary for nothing
    exact_by_len: dict[int, list[str]] = {}
    for r in sorted(psl.exact):
        exact_by_len.setdefault(r.count(".") + 1, []).append(r)
    wild_by_len: dict[int, list[str]] = {}
    for b in sorted(psl.wild):
        wild_by_len.setdefault(b.count(".") + 2, []).append(b)
    exc_by_len: dict[int, list[str]] = {}
    for e in sorted(psl.exc):
        exc_by_len.setdefault(e.count(".") + 1, []).append(e)
    # suffix length s by longest match: plain rule of s labels, or a
    # wildcard base of s-1 labels (the * consumes one real label).
    # Ascending build => the LONGEST s ends outermost in the CASE chain.
    take = F.lit(2)  # the implicit-* fallback: suffix = last label, +1
    for s in sorted({*exact_by_len, *wild_by_len}):
        if s < 2:
            continue  # s=1 plain match gives take=2 — the default already
        matched = F.lit(False)
        if s in exact_by_len:
            matched = matched | last_k(s).isin(*exact_by_len[s])
        if s in wild_by_len:
            matched = matched | last_k(s - 1).isin(*wild_by_len[s])
        take = F.when((n >= s) & matched, F.lit(s + 1)).otherwise(take)
    take = F.least(take, n)
    dom = F.array_join(F.slice(labels, n - take + 1, take), ".")
    # exceptions override (an exception IS the registrable domain);
    # ascending build again so the longest exception wins
    for k, rules in sorted(exc_by_len.items()):
        lk = last_k(k)
        dom = F.when((n >= k) & lk.isin(*rules), lk).otherwise(dom)
    return dom


def with_url_keys(
    df: DataFrame,
    url_col: str = "url",
    strip_www: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Append ``canonical_url``, ``host``, ``domain`` columns — the
    map-only projection every downstream domain operator starts from.
    ``tracking_params`` threads through to :func:`canonicalize_url` (and
    from here through every downstream operator), so a corpus that knows
    its ``ref`` is a tracker opts in without reimplementing the chain."""
    # The three key expressions are pure functions of (url_col, strip_www,
    # tracking_params) — memoized because building the regexp chains costs
    # ~70 py4j constructor RPCs (1-5 ms each of driver time), and the
    # composed operators (plan_frontier, prepare_crawl) instantiate this
    # projection several times per query. Column objects are immutable
    # expression wrappers, safe to reuse across DataFrames.
    key = (url_col, strip_www, tuple(tracking_params))
    cols = _URL_KEY_COLS.get(key)
    if cols is None:
        host = extract_host(F.col(url_col), strip_www=strip_www)
        cols = {
            "canonical_url": canonicalize_url(
                F.col(url_col), strip_www=strip_www, tracking_params=tracking_params
            ),
            "host": host,
            "domain": registrable_domain(host),
        }
        _URL_KEY_COLS[key] = cols
    return df.withColumns(cols)


def dedup_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Exact URL-level dedup after canonicalization: keep the smallest id
    per canonical URL (the crawl-stability convention — oldest capture
    wins). One hash aggregate on a near-uniform key; the same shape and
    scale story as ``dedup.exact``."""
    keyed = with_url_keys(df, url_col, tracking_params=tracking_params)
    return (
        keyed.groupBy("canonical_url")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .select(id_col, "canonical_url", "n_dups")
    )


def url_revisions(
    df: DataFrame,
    url_col: str = "url",
    crawl_col: str = "crawl",
    text_col: str = "text",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Cross-crawl URL change detection: for every canonical URL seen
    across crawl snapshots, how many snapshots captured it, how many
    DISTINCT content versions exist, and the latest version's
    fingerprint. This is the operator a re-crawl pipeline runs before
    incremental ingest — unchanged URLs (``changed = false``) skip
    processing entirely; changed ones feed ``dedup_against_reference``.

    Columns out: ``canonical_url, domain, n_crawls, n_versions, changed,
    first_crawl, last_crawl, latest_fp``.

    Determinism + engine parity: the content fingerprint is the 60-bit
    md5 prefix rendered as 15 lowercase hex chars (byte-replayable:
    DuckDB ``('0x' || substr(md5(t),1,15))::bigint``); "latest" is
    decided by the packed bigint ``crawl * 2^40 + id``. Bounds (input
    contract): ``crawl`` < 2^23, ``id`` < 2^40, and (crawl, id) unique
    per row.

    NULL text (a failed fetch): the capture counts toward crawl coverage
    (``n_crawls``, ``first_crawl``/``last_crawl``) but is NOT a content
    version — consistent on both sides of the contract because
    ``count(distinct)`` skips NULL fingerprints and the packed ``max``
    skips NULL rows, so ``latest_fp`` is the latest FINGERPRINTED
    version (never NULL for a group with any successful capture).

    Plan shape — every aggregate buffer is NUMERIC on purpose (the
    events_ohlc recipe): ``domain`` rides in the GROUP KEY (functionally
    dependent on canonical_url — the canonical form embeds the same
    normalized host the domain derives from), and "latest fingerprint"
    is ``max`` over ONE decimal(38,0) packing ``ord * 2^60 + fp60`` —
    no string-buffered min/first/max_by, which would degrade the whole
    stack to SortAggregate over the Expanded corpus stream. Result: one
    map-only projection into a hash-based aggregate on a near-uniform
    key; the two count-distincts ride the same shuffle via Expand.
    Nothing broadcasts, collects, or joins."""
    from decimal import Decimal

    keyed = with_url_keys(df, url_col, tracking_params=tracking_params)
    fp60 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long")
    ordk = F.col(crawl_col).cast("long") * F.lit(2**40) + F.col(id_col).cast("long")
    rows = keyed.select(
        "canonical_url",
        "domain",
        F.col(crawl_col).cast("long").alias("_crawl"),
        (ordk.cast("decimal(38,0)") * F.lit(Decimal(2**60)) + fp60.cast("decimal(38,0)")).alias("_ordfp"),
        fp60.alias("_fp"),
    )
    return (
        rows.groupBy("canonical_url", "domain")
        .agg(
            F.count_distinct("_crawl").alias("n_crawls"),
            F.count_distinct("_fp").alias("n_versions"),
            F.min("_crawl").alias("first_crawl"),
            F.max("_crawl").alias("last_crawl"),
            F.max("_ordfp").alias("_latest_packed"),
        )
        .withColumn("changed", F.col("n_versions") > 1)
        .withColumn(
            "latest_fp",
            F.lpad(
                F.lower(F.hex((F.col("_latest_packed") % F.lit(Decimal(2**60))).cast("long"))),
                15,
                "0",
            ),
        )
        .select(
            "canonical_url", "domain", "n_crawls", "n_versions", "changed",
            "first_crawl", "last_crawl", "latest_fp",
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Per-registrable-domain corpus rollup: document count, distinct
    canonical URLs, kept-document count and mean quality logit (the
    ``text.quality_score`` linear filter, integer-e7 units so the mean
    is bit-replayable).

    Plan shape: one map-only projection (URL keys + quality logit over
    the same scan — no self-join of two projections) into one hash
    aggregate on the domain key; ``count(distinct)`` rides the same
    shuffle via the two-phase Expand. Domain keys are low-cardinality
    and power-law skewed at crawl scale — exactly the shape AQE's skew
    handling and partial aggregation absorb; nothing here broadcasts or
    collects."""
    from apache_cassandra_spark.analytics.text import quality_score

    keyed = with_url_keys(df, url_col, tracking_params=tracking_params)
    scored = quality_score(keyed, id_col=id_col, text_col=text_col, extra_cols=("domain", "canonical_url"))
    return (
        scored.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical_url").alias("n_urls"),
            F.sum(F.col("keep").cast("bigint")).alias("n_keep"),
            F.sum("logit_e7").alias("sum_logit_e7"),
        )
        .withColumn(
            "mean_logit",
            F.round(F.col("sum_logit_e7").cast("double") / (F.col("n_docs").cast("double") * F.lit(1e7)), 6),
        )
        .orderBy("domain")
    )


#: one <url> or <sitemap> element (sitemaps.org protocol; sitemap
#: documents are machine-generated, so the regexp extractor over the
#: canonical element forms is exact in practice — a full XML parse
#: belongs to a DOM variant, documented not silently wrong)
_SITEMAP_URL_ELEM_RE = r"(?is)<url\s*>.*?</url\s*>"
_SITEMAP_IDX_ELEM_RE = r"(?is)<sitemap\s*>.*?</sitemap\s*>"


def _sitemap_field(elem: Column, tag: str) -> Column:
    from apache_cassandra_spark.analytics.html import decode_entities

    raw = F.trim(F.regexp_extract(elem, rf"(?is)<{tag}\s*>(.*?)</{tag}\s*>", 1))
    # unwrap CDATA (several common generators emit
    # <loc><![CDATA[...]]></loc>); CDATA content is NOT entity-encoded
    cdata = F.trim(F.regexp_extract(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", 1))
    return F.when(raw.rlike(r"(?s)^<!\[CDATA\[.*\]\]>$"), cdata).otherwise(
        F.trim(decode_entities(raw))
    )


def sitemap_xml_from_payload(
    df: DataFrame,
    payload_col: str = "payload",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Fetched sitemap BYTES → the decoded XML text column
    :func:`parse_sitemap` takes. sitemap.org allows gzipped sitemaps
    (``.xml.gz`` served as ``application/gzip`` — no Content-Encoding
    header, the bytes themselves are the gzip stream), so payloads with
    gzip magic inflate first (the strict multi-member gunzip shared
    with ``warc.decode_http_bodies``); everything else decodes as UTF-8
    with replacement. Corrupt gzip → NULL xml plus the reason in
    ``sitemap_decode_error`` (the corrupt-row contract). One
    Arrow-batched ``mapInPandas`` pass, executor-side."""
    import pandas as pd

    from apache_cassandra_spark.sources.warc import _gunzip_strict

    cols = df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{xml_col}` string, sitemap_decode_error string"

    def _decode(batches):
        for pdf in batches:
            xmls, errs = [], []
            for b in pdf[payload_col]:
                if b is None:
                    xmls.append(None), errs.append(None)
                    continue
                data = bytes(b)
                try:
                    if data[:2] == b"\x1f\x8b":
                        data = _gunzip_strict(data)
                    xmls.append(data.decode("utf-8", errors="replace"))
                    errs.append(None)
                except Exception as e:  # zlib.error / ValueError
                    xmls.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pdf.assign(**{xml_col: xmls, "sitemap_decode_error": pd.Series(errs, index=pdf.index, dtype=object)})

    return df.mapInPandas(_decode, schema=out_schema).select(
        *cols, xml_col, "sitemap_decode_error"
    )


def parse_sitemap(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    passthrough: tuple[str, ...] = ("domain",),
) -> DataFrame:
    """Parse sitemap.org XML documents (one per row) into one row per
    entry: ``kind`` (``url`` for page entries, ``sitemap`` for index
    children — feed those back through the fetcher), ``loc``
    (entity-decoded — sitemaps escape ``&``), ``lastmod``,
    ``changefreq``, ``priority``. The crawl-discovery complement of
    :mod:`.robots` (robots.txt's ``Sitemap:`` lines name these files).

    Plan: elements extracted and parsed IN-ARRAY (one codegen
    projection), then a single explode — no shuffle; ``passthrough``
    columns ride along (typically the domain key)."""
    def entry(kind: str, elem: Column) -> Column:
        return F.struct(
            F.lit(kind).alias("kind"),
            _sitemap_field(elem, "loc").alias("loc"),
            _sitemap_field(elem, "lastmod").alias("lastmod"),
            _sitemap_field(elem, "changefreq").alias("changefreq"),
            _sitemap_field(elem, "priority").try_cast("double").alias("priority"),
        )

    xml = F.col(xml_col)
    entries = F.concat(
        F.transform(
            F.regexp_extract_all(xml, F.lit(_SITEMAP_URL_ELEM_RE), 0),
            lambda e: entry("url", e),
        ),
        F.transform(
            F.regexp_extract_all(xml, F.lit(_SITEMAP_IDX_ELEM_RE), 0),
            lambda e: entry("sitemap", e),
        ),
    )
    out = df.select(*passthrough, F.explode(entries).alias("_e")).select(
        *passthrough, "_e.kind", "_e.loc", "_e.lastmod", "_e.changefreq", "_e.priority"
    )
    return out.where(F.col("loc") != "")


def fetch_schedule(
    pages: DataFrame,
    delays: DataFrame | None = None,
    default_delay: float = 1.0,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    priority_col: str | None = None,
) -> DataFrame:
    """Politeness-paced fetch plan: append ``fetch_seq`` (0-based
    position in the domain's queue) and ``fetch_at_sec`` (earliest
    fetch offset = seq × the domain's delay) to a frontier of pages —
    the scheduling step between discovery (:func:`parse_sitemap`,
    outlinks) and the fetcher. ``delays`` is a ``(domain,
    crawl_delay)`` frame (:func:`..robots.crawl_delays`); absent
    domains pace at ``default_delay``. Queue order is
    ``priority_col`` ascending (if given) then ``id_col`` — ties are
    impossible under the unique-id contract, so the schedule is
    deterministic.

    Scale shape: ONE Exchange on domain feeding a row_number window —
    per-domain parallelism, no global sort; the delays side joins
    AQE-decided (site-count-sized, broadcastable). A mega-domain's
    pages serialize onto one queue by DESIGN — politeness (one fetch
    per delay per domain) is the very constraint being computed, so
    per-domain key skew here reflects the real fetch bottleneck, not a
    plan defect; fetchers shard the schedule by ``fetch_at_sec``
    range, not by domain."""
    # SQL-text construction (the r14 similarity-family lever): the
    # window + pacing expressions are fixed trees rebuilt per call
    # (~290 py4j RPCs in Column form); rendering keeps the plan
    # node-identical — fractional literals stay DOUBLE via an explicit
    # cast (bare fractional SQL literals parse as DECIMAL).
    order_sql = (
        f"`{priority_col}` ASC, `{id_col}` ASC" if priority_col else f"`{id_col}` ASC"
    )
    d = (
        delays.selectExpr("domain AS _d_domain", "crawl_delay AS _d_delay")
        if delays is not None
        else None
    )
    out = pages.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY `{domain_col}` ORDER BY {order_sql}) - 1 AS fetch_seq",
    )
    default_sql = f"CAST({float(default_delay)!r} AS DOUBLE)"
    if d is not None:
        out = out.join(d, out[domain_col] == d["_d_domain"], "left").drop("_d_domain")
        delay_sql = f"coalesce(_d_delay, {default_sql})"
    else:
        delay_sql = default_sql
    return out.selectExpr(
        "*", f"CAST(fetch_seq * {delay_sql} AS DOUBLE) AS fetch_at_sec"
    ).drop("_d_delay")


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 5,
    url_col: str = "url",
    to_col: str = "redirect_to",
) -> DataFrame:
    """Follow single-hop redirect edges (``warc.redirect_edges`` output)
    to their destination, bounded at ``max_hops`` — the crawler
    convention (reference fetchers give up after ~5 redirects, which
    also guards cycles without path bookkeeping). Returns one row per
    redirecting URL: ``(url, final_url, n_hops, resolved)`` where
    ``resolved`` is False when the chain is still pointing at another
    redirect after the hop budget (a loop, or a chain longer than the
    budget — the caller drops or flags those captures).

    NULL targets drop up front (path-relative Locations resolve to NULL
    by the ``redirect_edges`` contract); a URL captured with several
    redirect responses keeps the lexicographically-smallest target so
    the map is a FUNCTION (deterministic, order-free).

    Scale shape: the unrolled-iteration discipline of the graph family
    (pagerank/HITS) — ``max_hops - 1`` equality self-joins on the
    redirect table (redirect rows are a small fraction of captures),
    each hop a hash join + coalesce projection, ``localCheckpoint``
    lineage cuts per hop; no recursion, no driver loops over rows."""
    e = (
        edges.where(F.col(to_col).isNotNull())
        .groupBy(F.col(url_col).alias("_src"))
        .agg(F.min(to_col).alias("_dst"))
        # lazy (r14): the hop-join lineage cuts materialize under the
        # caller's action — the eager form ran max_hops build-time jobs
        .localCheckpoint(eager=False)
    )
    cur = e.select(
        F.col("_src").alias(url_col),
        F.col("_dst").alias("final_url"),
        F.lit(1).alias("n_hops"),
    )
    for _ in range(max_hops - 1):
        hop = e.select(
            F.col("_src").alias("_h_src"), F.col("_dst").alias("_h_dst")
        )
        cur = (
            cur.join(hop, cur["final_url"] == hop["_h_src"], "left")
            .select(
                url_col,
                F.coalesce("_h_dst", "final_url").alias("final_url"),
                (
                    F.col("n_hops")
                    + F.when(F.col("_h_dst").isNotNull(), 1).otherwise(0)
                ).alias("n_hops"),
            )
            .localCheckpoint(eager=False)
        )
    probe = e.select(F.col("_src").alias("_p_src"))
    return (
        cur.join(probe, cur["final_url"] == probe["_p_src"], "left")
        .select(
            url_col,
            "final_url",
            "n_hops",
            F.col("_p_src").isNull().alias("resolved"),
        )
    )


def plan_frontier(
    candidates: DataFrame,
    crawled: DataFrame | None = None,
    robots_rules: DataFrame | None = None,
    delays: DataFrame | None = None,
    url_col: str = "url",
    priority_col: str | None = None,
    default_delay: float = 1.0,
    strip_www: bool = True,
    tracking_params: tuple[str, ...] | None = None,
) -> DataFrame:
    """The discovery-side front door, composed — the fetch-plan twin of
    ``pipeline.prepare_crawl`` (which curates what was ALREADY fetched;
    this plans what to fetch NEXT). Candidates are whatever discovery
    produced — sitemap ``loc``s (:func:`parse_sitemap`), outlink
    targets (``html.outlink_graph``), redirect destinations
    (:func:`resolve_redirects`) — and flow through: canonical URL keys
    → per-canonical dedup (best = MIN ``priority_col`` when given, with
    the lexicographically-smallest source URL as the representative —
    deterministic, order-free) → already-crawled anti-join (``crawled``
    URLs key in the SAME canonical space, so tracker/case noise can't
    re-enqueue a captured page) → robots compliance
    (:func:`..robots.match_allowed` when ``robots_rules`` given —
    disallowed URLs never reach the fetch queue) → politeness pacing
    (:func:`fetch_schedule` with :func:`..robots.crawl_delays`).

    Output: one row per NEW allowed canonical URL —
    ``(url, canonical_url, host, domain [, priority], fetch_seq,
    fetch_at_sec)`` — ready to shard by ``fetch_at_sec`` range.

    Scale shape, stage by stage: one map-only keying projection; the
    per-canonical winner is ONE row_number window (top-1 per key →
    WindowGroupLimit with partial pushdown — NOT a min(url)/first()
    aggregate, whose immutable string buffers demote to SortAggregate,
    the events_ohlc anti-pattern); a LEFT ANTI hash join against the
    crawled set (AQE-decided, keyed on the canonical the window just
    partitioned by, so the partitioning reuses); the robots join +
    per-URL winner window (canonical_url doubles as the unique id the
    window contract needs); one Exchange on domain for the pacing
    window. Nothing collects, nothing broadcasts by force.

    Composition of independently tested/gated pieces: URL keys by
    corpus_domain_stats' chain, dedup-winner semantics by
    web.dedup_urls' convention, compliance by corpus_robots +
    the §2.2.2 percent-space fuzz locks, pacing by the
    fetch_schedule determinism locks."""
    from apache_cassandra_spark.analytics import robots as RB

    tp = TRACKING_PARAMS if tracking_params is None else tracking_params
    keyed = with_url_keys(
        candidates.where(F.col(url_col).isNotNull()),
        url_col,
        strip_www=strip_www,
        tracking_params=tp,
    )
    order_sql = (f"`{priority_col}` ASC, " if priority_col else "") + f"`{url_col}` ASC"
    fresh = (
        keyed.selectExpr(
            "*",
            f"row_number() OVER (PARTITION BY canonical_url ORDER BY {order_sql}) AS _rk",
        )
        .where("_rk = 1")
        .drop("_rk")
    )
    if crawled is not None:
        seen = (
            with_url_keys(
                crawled.where(F.col(url_col).isNotNull()).select(url_col),
                url_col,
                strip_www=strip_www,
                tracking_params=tp,
            )
            .select("canonical_url")
            .distinct()
        )
        fresh = fresh.join(seen, "canonical_url", "left_anti")
    if robots_rules is not None:
        fresh = (
            RB.match_allowed(
                fresh, robots_rules, url_col=url_col,
                domain_col="domain", id_col="canonical_url",
            )
            .where(F.col("allowed"))
            .drop("allowed", "matched_rule")
        )
    return fetch_schedule(
        fresh,
        delays,
        default_delay=default_delay,
        domain_col="domain",
        id_col="canonical_url",
        priority_col=priority_col,
    )
