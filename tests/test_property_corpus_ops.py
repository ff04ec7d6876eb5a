"""Property fuzz of the round-3 corpus operators against straight-line
Python models: chunking (coverage, overlap, tail semantics), within-doc
segment dedup (first-occurrence survival), and mixture sampling
(threshold arithmetic on measured token mass)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.analytics.dedup import dedup_within_doc
from apache_cassandra_spark.analytics.pipeline import chunk_documents, mixture_sample

WORDS = ["a", "bb", "tok", "zz", ""]
doc_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12)


def _chunk_model(docs: list[list[str]], window: int, stride: int):
    out = []
    for doc_id, words in enumerate(docs):
        toks = [w for w in words if w]  # empties dropped like tokens()
        for cid, start in enumerate(range(0, len(toks), stride)):
            piece = toks[start : start + window]
            out.append((doc_id, cid, " ".join(piece), len(piece)))
    return sorted(out)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(doc_st, min_size=1, max_size=5),
    window=st.integers(1, 6),
    stride=st.integers(1, 6),
)
def test_chunk_documents_matches_python_model(spark, docs, window, stride):
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk"], r["n_tokens"])
        for r in chunk_documents(df, window=window, stride=stride).collect()
    )
    assert got == _chunk_model(docs, window, stride)


SEGS = ["", "x", "seg one", "seg two", "x"]
seg_doc_st = st.lists(st.sampled_from(SEGS), min_size=1, max_size=6)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(seg_doc_st, min_size=1, max_size=5))
def test_dedup_within_doc_matches_python_model(spark, docs):
    rows = [(i, "\n".join(segs)) for i, segs in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_segments"], r["n_dropped"])
        for r in dedup_within_doc(df).collect()
    }
    for doc_id, _ in enumerate(docs):
        segs = "\n".join(docs[doc_id]).split("\n")  # round-trip like the operator
        seen, kept = set(), []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[doc_id] == ("\n".join(kept), len(segs), len(segs) - len(kept))


def _draw(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 6)),
        min_size=1,
        max_size=30,
    ),
    wa=st.sampled_from([0.05, 0.3, 0.9]),
    wb=st.sampled_from([0.1, 0.5]),
)
def test_mixture_sample_matches_python_model(spark, data, wa, wb):
    rows = [(i, "w " * ntok, src) for i, (src, ntok) in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    weights = {"a": wa, "b": wb}
    got = {r["doc_id"] for r in mixture_sample(df, weights).collect()}

    tok = {i: ntok for i, (_, ntok) in enumerate(data)}
    t_s = {}
    for i, (src, _) in enumerate(data):
        if src in weights:
            t_s[src] = t_s.get(src, 0) + tok[i]
    t_all = sum(t_s.values())
    expect = set()
    for i, (src, _) in enumerate(data):
        if src not in weights or t_s[src] == 0:
            continue
        thresh = round(min(weights[src] * t_all / t_s[src], 1.0) * 1_000_000)
        if _draw(i) < thresh:
            expect.add(i)
    assert got == expect


# --- skew salting -------------------------------------------------------------

salted_rows_st = st.lists(
    st.tuples(st.sampled_from(["hot", "k1", "k2"]), st.integers(-50, 50)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=salted_rows_st, n_salts=st.integers(1, 9))
def test_salted_agg_matches_python_model(spark, rows, n_salts):
    from apache_cassandra_spark.functions.skew import salted_agg

    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(rows)], "id long, k string, v double"
    )
    got = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", "id"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            n_salts=n_salts, salt_on="id",
        ).collect()
    }
    model = {}
    for _, (k, v) in enumerate(rows):
        n, s, mn, mx = model.get(k, (0, 0.0, float("inf"), float("-inf")))
        model[k] = (n + 1, s + v, min(mn, float(v)), max(mx, float(v)))
    assert got == model


# --- BPE encode ---------------------------------------------------------------

bpe_word_st = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=6
)
bpe_merge_st = st.lists(
    st.tuples(st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
              st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"])),
    min_size=0, max_size=4,
)


def _encode_model(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(words=bpe_word_st, merges=bpe_merge_st)
def test_bpe_encode_fuzz_matches_python_model(spark, words, merges):
    """Greedy merge-fold equivalence on adversarial a/b strings — chains
    like 'aaaa' under (a,a) exercise the non-overlap tie-off that naive
    string replacement gets wrong."""
    from apache_cassandra_spark.analytics.text import bpe_encode

    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    got = bpe_encode(df, merges).first()["bpe_tokens"]
    want = [tok for w in words for tok in _encode_model(w, merges)]
    assert got == want, (words, merges, got, want)
