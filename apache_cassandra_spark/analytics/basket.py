"""Co-occurrence / market-basket mining: pairwise item support counts.

The classic "customers who bought X also bought Y" aggregation — and,
in a training-data pipeline, the same shape computes tag/domain/source
co-occurrence for mixture design. The reference fork delegated exactly
this kind of job to Hadoop/Pig; here it is one DataFrame graph.

Scale design (the quadratic trap): pairs-per-basket grows as |basket|²,
and real order/tag data has a zipf tail of pathological mega-baskets
(a crawler session with 10k tags → 5·10⁷ pairs from one basket).
``max_basket_size`` drops those baskets outright — same bounded-blowup
philosophy as the Jaccard ``max_doc_freq`` stop-shingle guard — and
``min_item_support`` prunes rare items BEFORE pair generation (classic
a-priori: a pair can't be frequent if either member isn't), which is
what keeps the explode small at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str = "o_orderkey",
    item_col: str = "l_partkey",
    min_pair_support: int = 2,
    min_item_support: int = 2,
    max_basket_size: int = 1_000,
    k: int | None = None,
) -> DataFrame:
    """``(item_a, item_b, support)`` for item pairs co-occurring in at
    least ``min_pair_support`` baskets, ``item_a < item_b``; optionally
    top-``k`` by support (ties broken by the pair, deterministic).

    Plan shape: distinct (basket, item) → item-support prune (a-priori)
    → constant-memory basket-size count prune → per-basket sorted item
    array → in-array pair explode (pure JVM expression, no join) → pair
    hash-aggregate. The only corpus-sized shuffles are on the basket id
    (uniform) and the pair key; the basket-size semi-join leaves the
    frame partitioned on the basket id, so the collect_set groupBy adds
    no exchange. The count-based size prune runs BEFORE collect_set so a
    pathological mega-basket is dropped with a constant-size aggregation
    buffer, never materialized as an array (the in-array generation is
    then bounded by max_basket_size² pairs per row). Measured at sf0.1:
    ~19% faster than the previous per-basket self-join (two exchanges +
    sorts saved), byte-identical output."""
    # Eager checkpoint (r14): the distinct (basket, item) frame has THREE
    # lazy consumers (the item-support aggregate, the basket-size
    # aggregate, and the pair path itself) and ReuseExchange does NOT
    # unify them — the captured plan showed the input scanned 4x and the
    # distinct computed 3x, each with its own exchange (the branches
    # canonicalize differently once the semi-joins prune their pushed
    # filters). Materializing it once turns the plan into one scan + one
    # distinct; every prune then reads the checkpointed blocks.
    items = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if min_item_support > 1:
        freq = (
            items.groupBy("i")
            .agg(F.count(F.lit(1)).alias("_s"))
            .where(F.col("_s") >= min_item_support)
            .select("i")
        )
        items = items.join(freq, "i", "left_semi")
    if max_basket_size is not None:
        ok = (
            items.groupBy("b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_basket_size)
            .select("b")
        )
        items = items.join(ok, "b", "left_semi")
    # Pin the basket-aggregation exchange at the configured shuffle width
    # (AQE-coalesce-exempt): the stage it feeds — collect_set → in-array
    # pair explode → pair partial-aggregate — is QUADRATIC CPU per basket
    # row, and AQE's byte-sized coalescing (blind to per-row fan-out CPU)
    # squeezed it to 5-6 tasks at sf0.1, serializing ~3.7s of CPU that
    # runs wide under the pin (guide §2.5: synthetic-width/skew tension;
    # same diagnosis class as the r14 prefix-verify §12, but here the
    # heavy work follows THIS exchange directly, so the pin lands).
    # Interleaved A/B at sf0.1: 1.81 → 1.63s median; the checkpoint-side
    # pin was measured WORSE (2.17s) and is deliberately absent. The
    # width is the session's shuffle parallelism — cluster-configured,
    # not a local constant.
    spark_parts = int(items.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    baskets = (
        items.repartition(spark_parts, "b")
        .groupBy("b")
        .agg(F.sort_array(F.collect_set("i")).alias("arr"))
    )
    n = F.size("arr")
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("arr"),
                        lambda x, idx: F.transform(
                            F.slice(F.col("arr"), idx + 2, n),
                            lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_pair_support)
    )
    if k is not None:
        pairs = pairs.orderBy(F.col("support").desc(), "item_a", "item_b").limit(k)
    return pairs
