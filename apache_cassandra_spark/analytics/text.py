"""Text analysis operators: tokenization, token counting, quality scoring,
language ID, document fingerprinting.

All pure ``pyspark.sql.functions`` expressions (whole-stage codegen, no
Python in the loop). Tokenization is deliberately primitive-and-exact —
split on the space character, drop empties — so the DuckDB oracle can
reproduce it byte-for-byte; a production pipeline would swap in a real
tokenizer behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_cassandra_spark.cachectl import owned_cache

#: tiny per-language marker-word lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "with", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr": ("le", "la", "les", "et", "est", "pour", "que", "une", "dans", "avec"),
    "es": ("el", "la", "los", "y", "es", "para", "que", "una", "en", "con"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("it", "on", "as", "at", "by", "an", "be", "this")


def tokens(text: Column) -> Column:
    """Space-split tokens, empties dropped (array<string>).

    ``array_remove`` rather than a ``filter`` lambda: higher-order
    functions run interpreted per element (~10x slower than codegen'd
    expressions — measured on the sf0.1 shingle path)."""
    return F.array_remove(F.split(text, " "), "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def subword_token_estimate(text: Column) -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs, and
    individual punctuation marks (the shape a byte-pair tokenizer roughly
    follows)."""
    return F.regexp_count(F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality scoring features: length, token stats,
    punctuation / stopword / uppercase ratios, mean token length.
    ``extra_cols`` are passed through untouched so callers that need the
    features next to other derived keys (e.g. ``web.domain_stats``) stay
    one projection over one scan instead of a self-join."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9 ]"))
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(*EN_STOPWORDS)))
    n_upper = F.regexp_count(t, F.lit("[A-Z]"))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_punct / safe_chars, 6).alias("punct_ratio"),
        F.round(n_stop / safe_tokens, 6).alias("stopword_ratio"),
        F.round(n_upper / safe_chars, 6).alias("upper_ratio"),
        F.round((n_chars - n_tokens + 1) / safe_tokens, 6).alias("mean_token_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: score = marker hits per language,
    winner = max score with deterministic tie-break on language code.
    (An n-gram model in miniature; same argmax contract as fasttext-style
    classifiers so it can be swapped out.)"""
    toks = tokens(F.lower(F.col(text_col)))

    def matcher(words):
        # NB: a two-arg lambda would be interpreted by F.filter as
        # (element, index) — keep the closure single-arg
        return lambda x: x.isin(*words)

    scores = [
        F.size(F.filter(toks, matcher(words))).alias(f"score_{lang}") for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    pairs = F.array(
        *[F.struct(F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang")) for lang in LANG_MARKERS]
    )
    # struct max: highest score, ties broken by greatest language code
    best = F.array_max(pairs)
    return scored.select(
        id_col,
        best.lang.alias("lang_pred"),
        best.score.alias("lang_score"),
    )


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams over an ALREADY-MATERIALIZED token-array column.

    ``toks`` must be a bound column (e.g. via ``withColumn``), not an
    expression tree: the transform body indexes it n times per output
    gram, and Catalyst re-evaluates an unbound expression on every access
    (measured: quadratic blowup on the dedup shingle path). Direct
    ``t[i]..t[i+n-1]`` indexing, not ``slice()`` — the slice+lambda form
    is ~10x slower (interpreted per element)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(grams)


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams of a text column. Convenience form — for hot paths,
    materialize ``tokens(lower(text))`` first and use
    ``ngrams_from_tokens`` (see its docstring)."""
    return ngrams_from_tokens(tokens(F.lower(text)), n)


#: the Gopher "must contain ≥2 of these" stopword set (Rae et al. 2021, §A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def repetition_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction, most-frequent-token fraction, most-frequent-bigram fraction
    (Rae et al. 2021 §A1.1 use line/paragraph dup fractions; this corpus is
    single-line, so the token/n-gram family carries the signal).

    Scale: the top-fraction metrics need a per-document mode, computed as
    explode → groupBy(doc, gram) → max-over-doc — two hash aggregations on
    (doc_id, gram), no windows, no driver collection. The dup-token
    fraction stays array-local (``array_distinct``), zero shuffle."""
    t = F.col(text_col)
    toked = df.select(F.col(id_col), tokens(t).alias("_toks"))
    base = toked.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        F.round(
            (F.size("_toks") - F.size(F.array_distinct("_toks")))
            / F.greatest(F.size("_toks"), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
    )

    def top_frac(grams_col: Column, out: str):
        g = toked.select(F.col(id_col), F.explode(grams_col).alias("_g"))
        counts = g.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
        return counts.groupBy(id_col).agg(
            F.round(F.max("_c") / F.sum("_c"), 6).alias(out)
        )

    top_tok = top_frac(F.col("_toks"), "top_token_frac")
    top_bi = top_frac(ngrams_from_tokens(F.col("_toks"), 2), "top_bigram_frac")
    return (
        base.join(top_tok, id_col, "left")
        .join(top_bi, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_token_frac",
            F.coalesce("top_token_frac", F.lit(0.0)).alias("top_token_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher quality-rule flags (Rae et al. 2021 §A1.1), line rules
    omitted for the single-line corpus: token-count bounds, mean word
    length bounds, symbol-to-word ratio (``#``/ellipsis), alphabetic-word
    fraction, distinct hits from the 8-word stopword set; ``gopher_pass``
    is the conjunction of the thresholds (defaults = the paper's). THE
    single source of truth for the rule set — prepare_corpus filters on
    this flag rather than rebuilding the conjunction. Pure built-in
    expressions — whole-stage codegen.

    ``keep_cols`` carries extra input columns through to the output —
    consumers needing features alongside payload columns get them in ONE
    per-row projection instead of re-joining the corpus to its own
    features (a corpus-by-corpus self-join at scale)."""
    t = F.col(text_col)
    toked = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], tokens(t).alias("_toks"), t.alias("_t")
    )
    n = F.size("_toks")
    safe_n = F.greatest(n, F.lit(1))
    mean_len = F.aggregate("_toks", F.lit(0), lambda a, x: a + F.length(x)) / safe_n
    n_symbols = F.regexp_count("_t", F.lit(r"#|\.\.\.|…"))
    alpha_frac = F.size(F.filter("_toks", lambda x: x.rlike("[A-Za-z]"))) / safe_n
    stop_hits = F.size(
        F.array_intersect(
            F.transform("_toks", F.lower), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    out = toked.select(
        id_col,
        *keep_cols,
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(n_symbols / safe_n, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("alpha_frac") > min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits),
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4-style PII redaction: replace emails / phone-shaped numbers with
    fixed tags, report per-document hit counts. Regexes restricted to the
    syntax subset Java and RE2 interpret identically (no backrefs, no
    lookaround) so external oracles can reproduce the rewrite exactly."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document top-``k`` terms by tf·idf → ``(doc_id, term, tf, df,
    tfidf)`` — the rarity-weighting primitive of corpus analysis
    (keyword extraction, boilerplate spotting, quality weighting).

    ``tf`` = raw in-document count; ``idf = ln(N / df)``; ``tfidf``
    rounded to 6 and used for BOTH ranking and output, so the ordering
    is reproducible across engines (ties → lexicographic term).

    Scale shape: one explode feeds the (doc, term) count — the only
    corpus-sized shuffle — and that frame is **materialized once via
    eager localCheckpoint** (r14): it has two consumers (the per-doc
    scores and the document-frequency roll-up), and Spark's
    ReuseExchange can't unify them (self-join attribute dedup gives
    the branches different expression ids); as a lazy cache their
    cold-start stages raced and re-ran the tokenize+explode per
    consumer (interleaved A/B 0.84 -> 0.72s median at sf0.1, every
    pair in the checkpoint's favor — the dedup-family §3 race class,
    despite only two consumers). Document
    frequency is a partial-aggregated roll-up of the cached frame and
    joins back WITHOUT a forced broadcast: it has one row per distinct
    term — vocabulary cardinality, unbounded on web-scale text (typos,
    URLs, hex ids) — so the strategy is left to AQE, which still picks
    a broadcast when the measured size is small and falls back to a
    shuffled join when the vocabulary outgrows the driver (the same
    contract as the reconcile watermark join). Only the 1-row corpus
    count keeps its hint. The per-doc top-k is
    WindowGroupLimit-truncated before its shuffle. No Python anywhere."""
    from pyspark.sql import Window

    toked = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    tf = toked.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=True)
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf")
    )


#: fixed lexical benchmark queries over the driver corpus vocabulary —
#: shared by the corpus_bm25_topk gate (queries.py, incl. its oracle's
#: VALUES clause) and the scale probe, so the two workloads cannot drift
BM25_BENCH_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "fast key order sort"),
    (1, "table scan merge join"),
    (2, "window batch stream spark"),
)


def _bm25_term_expr(k1: float, b: float) -> str:
    """Per-(query-term, doc) BM25 contribution as ONE SQL scalar string
    over columns ``tf, df, dl, n_docs, total_dl`` — the SAME string
    runs through Spark's ``F.expr`` and the DuckDB oracle, so the
    double arithmetic (operand order, division points) is identical by
    construction (the _SYNTH_URL_SQL recipe applied to math). Lucene's
    always-positive idf ``ln((N−df+0.5)/(df+0.5)+1)``; ``dl/avgdl``
    written ``b·dl·N/total_dl`` — left-associative doubles, ONE
    division (the operand ORDER is the contract, not integer
    arithmetic: both engines evaluate the identical double sequence);
    micro-quantized to bigint BEFORE the per-query sum, so the
    aggregate is partition-order-proof.

    Every fractional literal is wrapped ``cast(x as double)``: Spark
    SQL parses bare fractional literals as DECIMAL (scale-limited
    arithmetic, ~1e-7 divergence measured) while DuckDB parses them as
    double — the cast is the one spelling both engines read as the
    same IEEE double."""

    def d(x: float) -> str:
        return f"cast({x!r} as double)"

    return (
        f"cast(round(ln((n_docs - df + {d(0.5)}) / (df + {d(0.5)}) + {d(1.0)})"
        f" * (tf * {d(k1 + 1.0)}) / (tf + {d(k1)} * ({d(1.0 - b)}"
        f" + {d(b)} * dl * n_docs / total_dl)) * {d(1000000.0)}) as bigint)"
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval over the corpus: for each query row
    ``(query_id, query)``, the top-``k`` documents by
    ``Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` →
    ``(query_id, doc_id, n_terms, bm25_micro)``. The retrieval
    primitive of corpus curation: retrieval-based decontamination
    (rank the corpus against eval prompts), targeted data selection,
    and eval-set leakage triage — where ``sim_topk`` ranks by
    embedding, this ranks by lexical match (Robertson & Zaragoza 2009,
    Found. Trends IR 3(4)).

    Determinism: per-term contributions micro-quantized to bigint by
    :func:`_bm25_term_expr` (shared verbatim with the DuckDB oracle),
    summed as exact integers; ties on the final score break by doc_id.

    Scale shape: the corpus pays ONE explode → (doc, term) hash
    aggregate (cached — four consumers: query-term postings, document
    length, the token total, and through the postings the document
    frequency; ReuseExchange can't unify self-join branches). The query
    term set broadcasts (request-bounded — it is the caller's query
    list), so the postings semi-join runs map-side and ONLY query-term
    postings flow further; document frequency is then computed FROM
    those postings — an aggregate bounded by the query terms, never a
    full-vocabulary roll-up (df per term depends only on that term's
    own postings, so restricting first is lossless). Document length
    joins AQE-decided (corpus cardinality — never force-broadcast, the
    round-7 tfidf lesson); the two 1-row totals keep their hint.
    Per-query top-k is WindowGroupLimit-truncated before its shuffle.
    No Python anywhere."""
    from pyspark.sql import Window

    toked = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    # eager checkpoint (r14): tf has FOUR downstream consumers (dl, the
    # total_dl scalar, the query-term postings join, and dfreq via tfq);
    # a lazy cache let their cold-start stages race and re-run the corpus
    # explode per consumer (see dedup._postings_and_sizes for the
    # measured race; bm25 2.65s -> 1.98s median at sf0.1). The other
    # text ops keep their caches: with only 1-2 consumers the forced
    # materialization job measured SLOWER than the duplicated pass.
    tf = toked.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=True)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    tot = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs")).crossJoin(
        tf.agg(F.sum("tf").alias("total_dl"))
    )
    qt = queries.select(
        "query_id", F.explode(tokens(F.lower(F.col("query")))).alias("term")
    ).distinct()
    # postings of the query terms only (term-distinct first: a term in
    # two queries must not double its postings into the df count)
    qterms = qt.select("term").distinct()
    tfq = tf.join(F.broadcast(qterms), "term")
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tfq.join(F.broadcast(qt), "term")
        .join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(tot))
        .withColumn("_s", F.expr(_bm25_term_expr(k1, b)))
    )
    agg = scored.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("_s").alias("bm25_micro")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25_micro").desc(), F.col(id_col))
    out = (
        agg.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", id_col, "n_terms", "bm25_micro")
    )
    return out  # tf is an eager checkpoint, not a cache — nothing to own


def collocations(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information → ``(w1, w2, n_pair, pmi_micro)`` — the classic
    association miner (Church & Hanks, Comput. Linguist. 16(1), 1990):
    multiword expressions ("hong kong"), templated boilerplate pairs,
    tokenizer-merge candidates.

    ``pmi = ln(p(a,b) / (p(a)·p(b)))`` with ``p(a,b) = c_ab/M`` (M =
    total adjacent pairs, pre-floor) and ``p(x) = c_x/N`` (N = total
    tokens), computed as ONE double expression with a fixed
    left-to-right product order — ``ln((c_ab·N·N) / (M·c_a·c_b))`` —
    then micro-quantized (``round(·1e6)`` as bigint), so any engine
    replaying the same integer counts through the same expression gets
    the same ranking (the ln last-ulp caveat of the LM scores applies).
    ``min_count`` floors ``c_ab`` BEFORE the unigram joins: hapax pairs
    of hapax words otherwise saturate the top of the ranking (their PMI
    is maximal by construction), and the floor prunes the join input.
    Ties break lexicographically on (w1, w2) — total order, the pair is
    the group key.

    Scale shape: the corpus token stream aggregates ONCE into each of
    two vocabulary-bounded count tables (unigram and adjacent-pair,
    both materialized once via eager localCheckpoint — the unigram
    table has THREE consumers (its total and both w1/w2 joins), the
    pair table two (its total and the join/floor path); as lazy
    caches their cold consumer stages raced and re-ran the corpus
    explode per consumer (r14 interleaved A/B 0.92 -> 0.74s median,
    every pair in the checkpoint's favor).
    The pair table joins the unigram counts on vocab keys (AQE decides
    the strategy — vocabulary cardinality is unbounded, no forced
    broadcast, the tfidf rule); the two 1-row totals crossJoin in.
    Final ranking is a TakeOrderedAndProject top-k — no global sort.
    No Python anywhere.
    """
    if k < 1 or min_count < 1:
        raise ValueError("need k >= 1 and min_count >= 1")
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(toks.alias("t"))
    uni = (
        base.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    bi = base.where(F.size("t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("w1"),
                    F.element_at("t", i + 2).alias("w2"),
                ),
            )
        ).alias("bg")
    )
    pairs = (
        bi.groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
        .localCheckpoint(eager=True)
    )
    n_tokens = uni.agg(F.sum("c").alias("_n"))
    m_pairs = pairs.agg(F.sum("cab").alias("_m"))
    pmi = F.round(
        F.log(
            (F.col("cab").cast("double") * F.col("_n") * F.col("_n"))
            / (F.col("_m").cast("double") * F.col("ca") * F.col("cb"))
        )
        * 1_000_000
    ).cast("long")
    out = (
        pairs.where(F.col("cab") >= min_count)
        .join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("ca")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("cb")), "w2")
        .crossJoin(n_tokens)
        .crossJoin(m_pairs)
        .select(
            "w1",
            "w2",
            F.col("cab").alias("n_pair"),
            pmi.alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
        .limit(k)
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over word
    n-gram hashes — one stable 128-bit id per document's content
    neighborhood (robust to local edits outside the minimal window)."""
    toked = df.select(F.col(id_col), F.col(text_col), tokens(F.lower(F.col(text_col))).alias("_toks"))
    grams = toked.withColumn("_grams", ngrams_from_tokens(F.col("_toks"), n))
    fp = F.array_min(F.transform(F.col("_grams"), F.md5))
    return grams.select(F.col(id_col), F.coalesce(fp, F.md5(F.col(text_col))).alias("fingerprint"))


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document unigram language-model score — the CCNet-style LM
    quality signal with the corpus as its own model: token ``t`` scores
    ``ln(count(t) / total_tokens)``, a document scores the sum/mean over
    its tokens. Low mean log-probability = rare-token-heavy (gibberish,
    boilerplate IDs, stray wrong-language fragments); high = stopword soup.

    Returns ``(id, n_tokens, logprob_micro, mean_logprob)``. Per-token
    log-probs are quantized to integer micro-units (``round(ln(p)·1e6)``)
    BEFORE the per-document sum, so the sum is integer-exact — immune to
    floating-point addition order across partitions — and an external
    engine replaying the arithmetic matches bit-for-bit (the only
    residual hazard is a library ``ln`` differing in the last ulp
    exactly on a rounding boundary, the same accepted risk as
    ``tfidf_top_terms``). Zero-token documents are dropped (no tokens,
    no score).

    Scale shape: one explode feeds both the vocabulary roll-up and the
    per-doc join; the vocabulary (bounded by distinct tokens, zipf-small
    next to the corpus) broadcasts back by default — the corpus-sized
    token stream never shuffles. Set ``broadcast_vocab=False`` when the
    vocabulary itself is huge (then it's a shuffled join and AQE handles
    the hot-stopword skew)."""
    toked = df.select(F.col(id_col).alias("id"), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
    # vocab is CACHED: it has two consumers (the total and the scored
    # join side), and total = vocab.agg(...) would otherwise re-run the
    # whole corpus explode+aggregate subtree — a third full corpus pass
    # (same two-consumer shape, and fix, as tfidf_top_terms' tf frame)
    vocab = toked.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).cache()
    total = vocab.agg(F.sum("cnt").alias("_total"))
    scored_vocab = (
        vocab.crossJoin(F.broadcast(total))
        .select("tok", F.round(F.log(F.col("cnt") / F.col("_total")) * 1_000_000).cast("long").alias("_lq"))
    )
    if broadcast_vocab:
        scored_vocab = F.broadcast(scored_vocab)
    out = (
        toked.join(scored_vocab, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_lq").alias("logprob_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "logprob_micro",
            F.round(F.col("logprob_micro") / F.col("n_tokens") / 1_000_000, 6).alias("mean_logprob"),
        )
    )
    return owned_cache(out, vocab)


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    lam_uni: float = 0.3,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document interpolated BIGRAM language-model score — the next
    step up from ``unigram_logprob`` and the shape CCNet's KenLM filter
    takes with the corpus as its own model: each bigram ``(prev, cur)``
    scores ``ln(λ·c(prev,cur)/c(prev) + (1−λ)·c(cur)/total)`` (Jelinek-
    Mercer interpolation with the unigram model, so unseen-bigram mass
    never zeroes — every observed bigram IS seen here, but interpolation
    still damps the one-count bigram spikes a raw MLE would score 0.0
    for repeated boilerplate), and a document scores the sum/mean over
    its ``n_tokens − 1`` bigrams. Captures word-ORDER disfluency that
    unigram scoring is blind to: shuffled text keeps its unigram score
    but craters here.

    Returns ``(id, n_bigrams, logprob_micro, mean_logprob)``. Same
    integer-micro quantization discipline as ``unigram_logprob``: each
    bigram's log-prob rounds to micro-units BEFORE the per-document sum,
    so the sum is addition-order-exact across partitions and an external
    engine replaying the arithmetic (same association order:
    ``(λ·cb)/cp + (λ_uni·cc)/total``) matches bit-for-bit. The two
    weights are SEPARATE literal parameters (not ``1 − lam``) on
    purpose: ``1.0 - 0.7`` is not the double ``0.3``, and a replaying
    engine parses ``0.3`` as the nearest double — both sides must feed
    the identical bit pattern into the product. Documents with fewer
    than two tokens are dropped (no bigrams, no score).

    Scale shape: the corpus token stream is read twice (unigram roll-up,
    bigram roll-up) but shuffles only on vocabulary-sized keys; the
    scored bigram table (vocab², zipf-truncated to bigrams that actually
    occur) joins back to the per-doc bigram stream — broadcast by
    default, set ``broadcast_model=False`` at web-corpus vocabulary
    sizes to fall back to a shuffled join (AQE splits the hot-stopword-
    pair skew).

    Cache contract (self-enforcing since round 7): the returned frame
    references a cached unigram-count intermediate, owned via
    ``cachectl.owned_cache`` — it is unpersisted automatically when the
    returned frame is garbage-collected, or eagerly via
    ``cachectl.release(result)`` after the terminal action."""
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    uni = base.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    total = uni.agg(F.sum("c").alias("_total"))
    bi_stream = base.where(F.size("t") >= 2).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("prev"),
                    F.element_at("t", i + 2).alias("cur"),
                ),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    bic = bi_stream.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        bic.join(uni.select(F.col("tok").alias("prev"), F.col("c").alias("cp")), "prev")
        .join(uni.select(F.col("tok").alias("cur"), F.col("c").alias("cc")), "cur")
        .crossJoin(F.broadcast(total))
        .select(
            "prev",
            "cur",
            F.round(
                F.log(
                    (F.lit(lam) * F.col("cb")) / F.col("cp")
                    + (F.lit(lam_uni) * F.col("cc")) / F.col("_total")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("_lq"),
        )
    )
    if broadcast_model:
        scored = F.broadcast(scored)
    out = (
        bi_stream.join(scored, ["prev", "cur"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("_lq").alias("logprob_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            "logprob_micro",
            F.round(F.col("logprob_micro") / F.col("n_bigrams") / 1_000_000, 6).alias(
                "mean_logprob"
            ),
        )
    )
    return owned_cache(out, uni)


def bpe_pair_counts(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the counting
    step of byte-pair-encoding vocabulary induction (the top pair is the
    next BPE merge; iterating this with a merge table trains a
    tokenizer). Returns the top-``k`` pairs ``(pair, cnt)`` weighted by
    word frequency, ties broken lexicographically.

    Scale shape: the corpus collapses to its word-frequency table FIRST
    (hash aggregate — vocabulary-sized, zipf-small), so pair explosion
    runs over distinct words × their lengths, not corpus tokens. Top-k
    via TakeOrderedAndProject (per-partition truncation, no global
    sort)."""
    toked = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
    words = toked.groupBy("word").agg(F.count(F.lit(1)).alias("_c"))
    pairs = (
        words.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substring(F.col("word"), i, 2),
                )
            ).alias("pair"),
            F.col("_c"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("_c").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(k)
    )


def _sym_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over a ``(syms array<string>, _c)``
    word-frequency frame — THE counting expression every ``bpe_train``
    round executes. Round 1 runs it over single-character symbols, where
    it is corpus-wide equivalent to ``bpe_pair_counts``'s substring
    plan; that equivalence is locked by tests/test_analytics.py::
    test_bpe_pair_counts_equals_train_round1 (the r11-verdict condition
    for retiring the text_bpe_pairs gate into text_bpe_train's).

    Returns ``(p struct<a,b>, cnt)``, un-ordered and un-truncated."""
    # guard single-symbol words: sequence(1, 0) auto-steps BACKWARDS
    # ([1, 0]) instead of returning empty, and index 0/size+1 throws
    idx = F.when(
        F.size("syms") > 1, F.sequence(F.lit(1), F.size("syms") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        words.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at(F.col("syms"), i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
            F.col("_c"),
        )
        .groupBy("p")
        .agg(F.sum("_c").alias("cnt"))
    )


def _apply_bpe_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge ``(a, b) -> a+b`` to a
    symbol array — a fold: append each symbol, collapsing it with the
    accumulator's tail when the pair matches. Matches reference BPE's
    non-overlapping left-to-right replacement ("aaa" + (a,a) -> [aa, a])."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str, int]]:
    """Byte-pair-encoding merge-table training (Sennrich et al. 2016) on
    the corpus: repeatedly find the most frequent adjacent symbol pair
    (weighted by word frequency, ties broken lexicographically) and fuse
    it corpus-wide. Returns the learned merge list ``[(left, right,
    count), ...]`` in training order — the artifact a tokenizer loads.

    Scale shape: the corpus collapses ONCE to its word-frequency table;
    every round then runs over that vocabulary-sized frame — pair count
    (hash aggregate + top-1 collect, the k-means collect-k pattern) and a
    JVM-side fold applying the merge. ``localCheckpoint`` per round
    truncates the growing lineage (same iterative-plan discipline as
    ``clustering.kmeans_assign``). Driver work is O(n_merges) rows.
    Training is inherently sequential in the merge list — the
    parallelism is within each round, as in any BPE trainer."""
    words = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(_chars(F.col("word")).alias("syms"), F.col("_c"))
        # lazy (r14): the round's top-1 collect below materializes the
        # cut in the same job — eager paid a separate job per round
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _sym_pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["p"]["a"], top[0]["p"]["b"], top[0]["cnt"]
        merges.append((a, b, int(cnt)))
        words = words.select(
            _apply_bpe_merge(F.col("syms"), a, b).alias("syms"), F.col("_c")
        ).localCheckpoint(eager=False)
    return merges


def _chars(word: Column) -> Column:
    """Split a word into its character array (array<string>).

    Callers must guarantee non-empty input (``tokens()`` drops empties):
    ``sequence(1, 0)`` auto-steps BACKWARDS ([1, 0]) instead of returning
    an empty array, which would mis-produce two empty-string symbols."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )


def _apply_merges(syms: Column, merges: list) -> Column:
    """Apply a trained merge table in training order to a symbol array —
    the BPE *encode* step (Sennrich et al. 2016 `apply_bpe`): each merge
    is one greedy left-to-right fold, chained. Accepts `(a, b)` or
    `(a, b, count)` tuples (the shape `bpe_train` returns)."""
    for m in merges:
        syms = _apply_bpe_merge(syms, m[0], m[1])
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE encoding with a trained merge table: every word is
    split to characters and the merge list is folded over it in training
    order. Returns ``(id_col, bpe_tokens array<string>, n_bpe_tokens)``.

    Scale shape: map-only — one nested JVM higher-order projection per
    row, no shuffle, no Python. The merge table is folded into the plan
    as literals (the tokenizer artifact is driver-side and tiny: a few
    10k merges in production)."""
    toks = tokens(F.lower(F.col(text_col)))
    encoded = F.flatten(F.transform(toks, lambda w: _apply_merges(_chars(w), merges)))
    return df.select(
        F.col(id_col),
        encoded.alias("bpe_tokens"),
        F.size(encoded).alias("n_bpe_tokens"),
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus BPE-token histogram under a trained merge table: top-``k``
    ``(token, cnt)`` weighted by word frequency, ties lexicographic — the
    vocabulary-usage profile a tokenizer-training pipeline reports.

    Scale shape: the corpus collapses to its word-frequency table FIRST
    (hash aggregate, zipf-small), the merge fold then runs once per
    DISTINCT word — not once per corpus token — and the final histogram
    is a vocabulary-sized hash aggregate + TakeOrderedAndProject."""
    words = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    encoded = words.select(
        F.explode(_apply_merges(_chars(F.col("word")), merges)).alias("token"),
        F.col("_c"),
    )
    return (
        encoded.groupBy("token")
        .agg(F.sum("_c").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


#: fixed linear quality-classifier weights (fasttext/CCNet-shaped model
#: distilled to its scoring arithmetic): stopword density is positive
#: evidence of running prose, punctuation soup / shouting negative,
#: length capped so one long doc can't saturate. Literal weights keep the
#: score engine-replayable; swap in trained weights per corpus.
QUALITY_WEIGHTS: dict[str, float] = {
    "bias": -1.0,
    "stopword_ratio": 2.5,
    "punct_ratio": -3.0,
    "upper_ratio": -1.5,
    "len_norm": 0.8,        # min(n_tokens, 500)/500 — rational, no ln()
    "mean_token_len": -0.1,
}


def quality_score(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    threshold: float = -0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Model-based quality filtering: a linear classifier over the
    `quality_features` columns — the CCNet/LLaMA-style learned filter
    reduced to its scoring arithmetic (weights are a literal artifact,
    exactly like the BPE merge table). Emits the integer ``logit_e7`` and the ``keep`` decision at ``threshold``; the logit is computed in
    integer 1e-7 units from the micro-quantized features, so any engine
    reproduces it exactly (weights are interpreted at 0.1 resolution; no
    exp/ln in the gate path — apply a sigmoid downstream if a
    probability is needed).

    Map-only: one projection over `quality_features`' projection.
    ``extra_cols`` pass through both projections (see quality_features)."""
    w = dict(QUALITY_WEIGHTS, **(weights or {}))
    feats = quality_features(df, text_col, id_col, extra_cols=extra_cols)
    len_norm = F.round(F.least(F.col("n_tokens"), F.lit(500)) / F.lit(500.0), 6)

    # integer micro-quantization (the unigram_logprob trick): each rounded
    # feature is the double nearest k/1e6, so round(x*1e6) recovers k
    # exactly in any engine; the logit then lives in integer 1e-7 units
    # (weights x10) — no float rounding boundary can flip the last digit.
    def micro(c: Column) -> Column:
        return F.round(c * F.lit(1_000_000.0)).cast("bigint")

    def w7(name: str) -> Column:
        return F.lit(int(round(w[name] * 10)))

    logit_e7 = (
        F.lit(int(round(w["bias"] * 10_000_000)))
        + w7("stopword_ratio") * micro(F.col("stopword_ratio"))
        + w7("punct_ratio") * micro(F.col("punct_ratio"))
        + w7("upper_ratio") * micro(F.col("upper_ratio"))
        + w7("len_norm") * micro(len_norm)
        + w7("mean_token_len") * micro(F.col("mean_token_len"))
    )
    thr_e7 = int(round(threshold * 10_000_000))
    return feats.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        logit_e7.alias("logit_e7"),
        (logit_e7 > F.lit(thr_e7)).alias("keep"),
    )


def normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical text cleanup — the first pass of every corpus pipeline:
    control characters become spaces, whitespace runs collapse to one
    space, ends trimmed. Pure regexp expressions (codegen, replayable in
    any POSIX-regex engine); Unicode NFC normalization is NOT applied
    (no JVM-builtin expression for it — run a Pandas-UDF pass if the
    corpus needs it). Emits the cleaned column plus a ``changed`` flag
    so pipelines can report how much of the corpus was touched."""
    t = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(t, r"[\x00-\x1F\x7F]", " "),
            " +",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        cleaned.alias(text_col),
        (cleaned != t).alias("changed"),
        F.length(cleaned).alias("n_chars"),
    )


def char_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon character entropy — the cheap gibberish /
    compression-artifact / key-dump detector quality pipelines run
    before heavier LM scoring (natural language sits ~3.5–4.5 bits/char
    in nats ≈ 2.4–3.1; base64 blobs and minified JS sit near the
    alphabet ceiling, repeated-fill padding near 0).

    Float discipline (the ``unigram_logprob`` contract): with per-doc
    char counts ``c`` and total ``n``,

        H = ln(n) − (Σ c·ln(c)) / n

    and each ``c·ln(c)`` term is quantized to integer micro-units
    BEFORE the sum (``round(c·ln(c)·10⁶)`` as bigint) so the distributed
    sum is associative — identical bits at any partitioning and in any
    engine replaying the same per-term quantization. Output:
    ``(id, n_chars_counted, sum_clnc_micro, entropy)`` with ``entropy``
    rounded to 6.

    Characters are matches of the EXPLICIT class
    ``[^\\n\\r\\u0085\\u2028\\u2029]`` — a bare ``'.'`` is NOT
    engine-portable (Java excludes \\r/\\u0085/\\u2028/\\u2029 from
    ``.``, RE2 excludes only \\n), so the exclusion set is spelled out
    and identical in both engines. Documents with no countable
    character emit no row.

    Scale shape: two map-side-combinable hash aggregates — (id, char)
    then (id); the first exchange carries one row per distinct char per
    doc (≤ alphabet size), not per character. No Python, no windows.
    """
    # literal codepoints inside the class (not escape sequences) so no
    # Python escapes resolve to literal codepoints, so no SQL-string
    # escaping layer can reinterpret the class
    line_terminators = "[^\n\r\u0085\u2028\u2029]"
    base = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(line_terminators), F.lit(0))
        ).alias("ch"),
    )
    cnt = base.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_chars_counted"),
        F.sum(F.round(F.col("c") * F.log(F.col("c")) * 1_000_000).cast("long")).alias(
            "sum_clnc_micro"
        ),
    )
    return per.select(
        F.col("id").alias(id_col),
        "n_chars_counted",
        "sum_clnc_micro",
        F.round(
            F.log(F.col("n_chars_counted"))
            - F.col("sum_clnc_micro") / F.col("n_chars_counted") / F.lit(1_000_000.0),
            6,
        ).alias("entropy"),
    )


def readability(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Flesch reading-ease score (Flesch 1948; the public
    readability formula 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/word)) — the classic "is this prose or a parts
    catalog" quality-filter signal, cheap enough to run before LM
    perplexity scoring.

    Deterministic counting rules, spelled out so the oracle reproduces
    them byte-for-byte (the same deliberately-primitive-and-exact stance
    as :func:`tokens`):

    * words      = space-split tokens, empties dropped (``tokens``)
    * sentences  = runs of ``[.!?]`` (``!!`` or ``?!`` end ONE
      sentence), floored at 1 so headline-style fragments still score
    * syllables  = vowel-group runs ``[aeiouy]+`` over the lowercased
      text — the standard one-pass approximation (no per-word minimum;
      vowel-less tokens like ``7`` or ``&&`` contribute 0, which is the
      honest signal for non-prose)

    All three counts are exact integers; the score is ONE float
    expression over them — identical literals, identical operation
    order in both engines, so the rounded result is bit-stable (the
    ``char_entropy`` float contract). Documents with zero words emit a
    NULL score (nothing to rate) rather than a fabricated constant.

    Output: ``(id, n_words, n_sentences, n_syllables, flesch)`` with
    ``flesch`` rounded to 4 places.

    Scale shape: map-only — three codegen'd regex/array counts per row,
    no explode, no shuffle, no Python. The regex classes are portable
    ASCII sets (identical under Java regex and RE2).
    """
    t = F.col(text_col)
    n_words = F.size(tokens(t)).cast("long")
    n_sentences = F.greatest(F.regexp_count(t, F.lit("[.!?]+")), F.lit(1)).cast("long")
    n_syllables = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    base = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(
            F.col("n_words") > 0,
            F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4),
        ).alias("flesch"),
    )
