"""DSIR importance log-weights vs an independent pure-Python model:
same tokenization (lowercased space-split, empties dropped), same
unigram+bigram features, same md5 bucket hash, same add-one-smoothed
log-ratio quantization, same integer per-doc sum. Edge rows pinned:
empty/whitespace docs (weight 0, n_feats 0 — kept, not dropped),
single-token docs (no bigram), an empty target (T = 0 still smooths),
and the monotonicity DSIR exists for: docs sharing the target's
vocabulary outscore docs that don't."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.analytics.pipeline import dsir_log_weights

B = 64


def _bucket(feature: str) -> int:
    h = int(hashlib.md5(f"dsir:{feature}".encode()).hexdigest()[:15], 16)
    return h % B


def _feats(text: str) -> list[int]:
    toks = [t for t in text.lower().split(" ") if t]
    feats = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(f) for f in feats]


def _model(corpus: dict[int, str], target: dict[int, str]) -> dict[int, tuple[int, int]]:
    raw = Counter(b for t in corpus.values() for b in _feats(t))
    tgt = Counter(b for t in target.values() for b in _feats(t))
    R, T = sum(raw.values()), sum(tgt.values())
    lam = {
        b: round(math.log(((tgt.get(b, 0) + 1) * (R + B)) / ((c + 1) * (T + B))) * 1e6)
        for b, c in raw.items()
    }
    out = {}
    for did, text in corpus.items():
        fb = Counter(_feats(text))
        out[did] = (sum(f * lam[b] for b, f in fb.items()), sum(fb.values()))
    return out


def _run(spark, corpus: dict[int, str], target: dict[int, str]):
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    tdf = spark.createDataFrame(list(target.items()), "doc_id long, text string")
    got = dsir_log_weights(cdf, tdf, buckets=B).collect()
    return {r["doc_id"]: (r["logw_micro"], r["n_feats"]) for r in got}


def test_matches_python_model(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "stock market prices fell sharply today",
        3: "the dog sat on the log",
        4: "",
        5: "   ",
        6: "singleton",
    }
    target = {100: "the cat and the dog sat together", 101: "a cat sat"}
    assert _run(spark, corpus, target) == _model(corpus, target)


def test_empty_target_still_smooths(spark):
    corpus = {1: "a b a", 2: "c d"}
    got = _run(spark, corpus, {})
    want = _model(corpus, {})
    assert got == want
    # with T=0 every lambda is ln((R+B)/((c+1)·B)) — finite, no crash
    assert all(isinstance(v[0], int) for v in got.values())


def test_target_affine_docs_outscore_disjoint_docs(spark):
    target = {100: "alpha beta gamma alpha beta"}
    corpus = {1: "alpha beta gamma", 2: "zulu yankee xray"}
    got = _run(spark, corpus, target)
    assert got[1][0] > got[2][0]


def test_buckets_guard():
    with pytest.raises(ValueError):
        dsir_log_weights(None, None, buckets=1)


def test_widthless_pre_r8_sketch_still_probes(spark):
    """Back-compat (round-8 review): a count-min sketch persisted BEFORE
    the width metadata column existed must still probe — with the
    documented best-effort width check (only the sketch-wider-than-probe
    direction is catchable without the metadata)."""
    from apache_cassandra_spark.analytics.sketches import cm_estimate, cm_sketch

    ev = spark.createDataFrame([(i % 7,) for i in range(100)], "item long")
    sk = cm_sketch(ev, "item", depth=2, width=32).drop("width")  # pre-r8 schema
    items = ev.distinct()
    est = {r["item"]: r["est"] for r in cm_estimate(sk, items, "item", depth=2, width=32).collect()}
    assert all(v >= 100 // 7 for v in est.values())  # never underestimates
    with pytest.raises(ValueError, match="corrupt sketch|probe width"):
        cm_estimate(sk, items, "item", depth=2, width=8).collect()


def test_dsir_recomputes_featurization_no_cache(spark):
    """The two-pass (recompute) form is the MEASURED winner: caching the
    corpus-cardinality (doc, bucket) table to share one featurization
    pass probed SLOWER (77.5s cached vs 53.1s two-pass at k=64 — see the operator's
    inline note), so the plan must contain NO InMemoryRelation; a cache
    reappearing here silently re-trades map recompute for a corpus-sized
    materialization (round-8 review + probe)."""
    corpus = spark.createDataFrame([(1, "a b c"), (2, "c d")], "doc_id long, text string")
    target = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    out = dsir_log_weights(corpus, target, buckets=B)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["a", "bb", "tok", "zz", "Qx", ""]
_doc_st = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    corpus_docs=st.lists(_doc_st, min_size=1, max_size=5),
    target_docs=st.lists(_doc_st, min_size=0, max_size=3),
)
def test_dsir_fuzz_matches_python_model(spark, corpus_docs, target_docs):
    """Random tiny corpora (including empty docs, repeated tokens,
    mixed case, empty targets) through the operator vs the independent
    Python model — same integer weight, same feature count, every id."""
    corpus = {i: " ".join(w) for i, w in enumerate(corpus_docs)}
    target = {100 + i: " ".join(w) for i, w in enumerate(target_docs)}
    assert _run(spark, corpus, target) == _model(corpus, target)


def test_dsir_resample_end_to_end(spark):
    """The composed DSIR pipeline: k docs drawn ∝ exp(logw) — with a
    strongly bimodal corpus (half target-affine, half disjoint) the
    sample must be exactly size k, heavily affine, deterministic under
    repartition, and carry the logw_micro provenance column."""
    from apache_cassandra_spark.analytics.pipeline import dsir_resample

    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta " * 5) for i in range(3)],
        "doc_id long, text string",
    )
    rows = []
    for i in range(200):
        text = ("alpha beta gamma delta " * 4) if i % 2 == 0 else ("zulu yankee xray whiskey " * 4)
        rows.append((i, text + f"tail{i}"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_resample(corpus, target, k=40, buckets=B)
    got = out.collect()
    assert len(got) == 40
    assert {r["doc_id"] for r in got} <= {i for i, _ in rows}
    affine = sum(1 for r in got if r["doc_id"] % 2 == 0)
    # affine docs carry weight ~e^(Δ/1e6) ≫ disjoint; expect near-total
    assert affine >= 35, f"only {affine}/40 target-affine picks"
    assert all(r["logw_micro"] is not None for r in got)
    # deterministic: a reshuffled input draws the identical sample
    again = dsir_resample(corpus.repartition(7), target, k=40, buckets=B)
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in got}


def test_resample_underflow_window_still_returns_k(spark):
    """A doc hundreds of nats above the field used to underflow every
    other weight to exactly 0.0 — which sample_weighted DROPS — so the
    sample silently shrank below k (round-8 review). The clamp floors
    the rebased weight at exp(-690) > 0 and the sample stays exactly k."""
    from apache_cassandra_spark.analytics.pipeline import dsir_log_weights, dsir_resample

    rows = [(0, " ".join(f"a{i % 250}" for i in range(8000)))]
    rows += [(i, f"z{i} w{i} q{i}") for i in range(1, 61)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(999, " ".join(f"a{i}" for i in range(250)) + " ")], "doc_id long, text string"
    )
    w = dsir_log_weights(corpus, target, buckets=512)
    lo, hi = w.agg(F.min("logw_micro"), F.max("logw_micro")).first()
    assert hi - lo > 745_000_000, f"gap {hi - lo} too small to exercise underflow"
    out = dsir_resample(corpus, target, k=20, buckets=512).collect()
    assert len(out) == 20


def test_resample_preserves_proportionality_deep_in_the_tail(spark):
    """The Gumbel-top-k key works in LOG space, so a 70-nat gap between
    two tail groups keeps its e^70 odds ratio even when both sit far
    below the corpus max — the exp-then-A-ES form collapsed everything
    ~21+ nats down to a uniform draw (round-8 fourth review). Built by
    patching dsir_log_weights' output is not possible (the gate shape
    is fixed), so the corpus is shaped to produce three tiers and the
    assertion is that NO far-tier doc outranks the mid tier."""
    from apache_cassandra_spark.analytics.pipeline import dsir_log_weights, dsir_resample

    # three tiers by construction: one huge affine doc (the max), 30
    # mid docs (affine vocab), 30 far docs (disjoint vocab). The target
    # is sized comparably to the corpus so the smoothing term ln(R/T)
    # doesn't swamp the per-feature affinity signal.
    bvocab = " ".join(f"b{i}" for i in range(30))
    rows = [(0, (bvocab + " ") * 200)]
    rows += [(i, (bvocab + " ") * 2) for i in range(1, 31)]
    rows += [(i, " ".join(f"z{i}x{j}" for j in range(60))) for i in range(31, 61)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(999, (bvocab + " ") * 300)], "doc_id long, text string"
    )
    w = {r["doc_id"]: r["logw_micro"] for r in dsir_log_weights(corpus, target, buckets=512).collect()}
    mid = min(w[i] for i in range(1, 31))
    far = max(w[i] for i in range(31, 61))
    # the tiers must be separated by far more than the Gumbel range
    # (±42e6 micro-nats) for the rank assertion to be deterministic
    assert mid - far > 90_000_000, f"tier gap {mid - far} too small"
    out = {r["doc_id"] for r in dsir_resample(corpus, target, k=25, buckets=512).collect()}
    assert len(out) == 25
    assert all(d <= 30 for d in out), f"far-tier docs leaked into the sample: {sorted(out)}"


def test_gumbel_draw_finite_at_hash_ceiling(spark):
    """The double ulp at 2^60 is 256, so (h+0.5)/2^60 rounds to exactly
    1.0 for the top ~64 hash values and ln(-ln 1.0) would be NULL —
    silently unsampleable (round-8 review). The clamp keeps the Gumbel
    finite at the ceiling; replicate the operator's exact expression."""
    r = spark.range(1).select(
        (-F.log(-F.log(F.least(
            (F.lit((1 << 60) - 1) + F.lit(0.5)).cast("double") / F.lit(float(1 << 60)),
            F.lit(1.0 - 2.0 ** -53),
        )))).alias("g"),
        # and WITHOUT the clamp the same h yields NULL — pins why it exists
        (-F.log(-F.log(
            (F.lit((1 << 60) - 1) + F.lit(0.5)).cast("double") / F.lit(float(1 << 60))
        ))).alias("g_unclamped"),
    ).first()
    assert r["g"] is not None and r["g"] < 40.0
    assert r["g_unclamped"] is None
