"""text.readability: the three deterministic counts (space-split words,
[.!?]+ sentence runs floored at 1, [aeiouy]+ vowel groups) and the Flesch
expression, including the zero-words NULL contract."""

import pytest

from apache_cassandra_spark.analytics.text import readability


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in readability(df).collect()}


def test_counts_and_score(spark):
    r = _run(spark, ["The cat sat. The dog ran!"])[0]
    assert r["n_words"] == 6
    assert r["n_sentences"] == 2
    # vowel groups: e, a, a, e, o, a
    assert r["n_syllables"] == 6
    # 206.835 - 1.015*(6/2) - 84.6*(6/6)
    assert r["flesch"] == pytest.approx(206.835 - 1.015 * 3.0 - 84.6 * 1.0, abs=1e-4)


def test_zero_words_emits_null_score(spark):
    r = _run(spark, ["   "])[0]
    assert r["n_words"] == 0
    assert r["flesch"] is None
    # the sentence floor still applies (count floor, not NULL)
    assert r["n_sentences"] == 1


def test_sentence_floor_for_fragments(spark):
    r = _run(spark, ["no terminal punctuation here"])[0]
    assert r["n_sentences"] == 1
    assert r["n_words"] == 4


def test_terminator_runs_count_once(spark):
    # "?!" and "..." are single sentence boundaries, not two/three
    r = _run(spark, ["What?! Really... yes."])[0]
    assert r["n_sentences"] == 3


def test_vowelless_tokens_contribute_zero_syllables(spark):
    r = _run(spark, ["7 && 9"])[0]
    assert r["n_words"] == 3
    assert r["n_syllables"] == 0
    assert r["flesch"] == pytest.approx(206.835 - 1.015 * 3.0, abs=1e-4)


def test_consecutive_vowels_are_one_group(spark):
    # "queue" -> "ueue" is one run; "aeiou" alone is one run
    r = _run(spark, ["queue aeiou"])[0]
    assert r["n_syllables"] == 2
