"""Property fuzz of corpus-wide line dedup (dedup.remove_duplicate_lines)
against a straight-line Python model: every distinct eligible line
survives only at its globally-first (doc_id, position); short lines are
kept everywhere; documents reassemble in position order and vanish when
nothing survives."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_cassandra_spark.analytics.dedup import remove_duplicate_lines

# tiny line alphabet forces heavy cross-document collisions, including
# lines both above and below the min_chars threshold and empty lines
LINES = ["", "ab", "alpha line", "beta content line", "gamma gamma", "x"]
doc_st = st.lists(st.sampled_from(LINES), min_size=0, max_size=5)
corpus_st = st.lists(doc_st, min_size=1, max_size=6)


def python_model(corpus: list[list[str]], min_chars: int) -> dict[int, str]:
    # operate on the serialized text like the operator does: a doc with
    # empty text is ONE empty line ("".split("\n") == [""]), not zero lines
    corpus = [("\n".join(lines)).split("\n") for lines in corpus]
    first: dict[str, tuple[int, int]] = {}
    for doc_id, lines in enumerate(corpus):
        for pos, line in enumerate(lines):
            if len(line) >= min_chars and line not in first:
                first[line] = (doc_id, pos)
    out: dict[int, str] = {}
    for doc_id, lines in enumerate(corpus):
        kept = [
            line
            for pos, line in enumerate(lines)
            if len(line) < min_chars or first[line] == (doc_id, pos)
        ]
        if kept:
            out[doc_id] = "\n".join(kept)
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_st, min_chars=st.sampled_from([1, 3, 8]))
def test_line_dedup_matches_python_model(spark, corpus, min_chars):
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df, min_chars=min_chars).collect()
    }
    assert got == python_model(corpus, min_chars)
