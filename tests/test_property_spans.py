"""Property fuzz of cross-document span dedup (dedup.dedup_spans) against
a straight-line Python model: every duplicated k-window survives only at
its globally-first (doc_id, pos); cut positions are the union of all
non-winner window covers; documents reassemble from surviving tokens."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.analytics.dedup import dedup_spans

# tiny vocabulary forces heavy window collisions within and across docs
WORDS = ["a", "b", "c"]
doc_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8)
corpus_st = st.lists(doc_st, min_size=1, max_size=5)


def python_model(corpus: list[list[str]], k: int) -> dict[int, tuple[str, int, int]]:
    first: dict[tuple, tuple[int, int]] = {}
    occurrences: dict[tuple, list[tuple[int, int]]] = {}
    for doc_id, toks in enumerate(corpus):
        for pos in range(len(toks) - k + 1):
            gram = tuple(toks[pos : pos + k])
            occurrences.setdefault(gram, []).append((doc_id, pos))
            first.setdefault(gram, (doc_id, pos))
    cut: dict[int, set[int]] = {}
    for gram, occ in occurrences.items():
        if len(occ) < 2:
            continue
        for doc_id, pos in occ:
            if (doc_id, pos) != first[gram]:
                cut.setdefault(doc_id, set()).update(range(pos, pos + k))
    out = {}
    for doc_id, toks in enumerate(corpus):
        kept = [t for i, t in enumerate(toks) if i not in cut.get(doc_id, set())]
        out[doc_id] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=corpus_st, k=st.integers(2, 4))
def test_dedup_spans_matches_python_model(spark, corpus, k):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in dedup_spans(df, k=k).collect()
    }
    assert got == python_model(corpus, k)
