"""Integer-exact statistical anomaly detection over event streams.

Per-key z-score outlier flagging — "which of this user's events deviate
more than k standard deviations from that user's own mean" — is the
behavioral-outlier primitive (abuse spikes, broken-client loops,
value-distribution drift) that a training-data pipeline runs before
trusting engagement signals. The reference could only answer it
client-side by walking every row of a CF (`get_range_slices`,
service/StorageProxy.java:795-868); here it is two hash aggregates and
one co-partitioned join.

Float parity is the whole design (same discipline as
`text.bigram_logprob` / `clustering`): a naive ``(v - avg) / stddev``
gate would hash differently per engine and per partitioning (float sum
order). Instead the test is algebraized to INTEGER arithmetic:

    z² > k²   ⇔   (n·v − S)² > k² · (n·Q − S²)

with ``v`` quantized to milli-units (``round(value · 1000)`` as bigint)
and ``S = Σv``, ``Q = Σv²`` per key. Integer sums are associative —
any partitioning, any engine, same bits. Population variance (n
divisor): the n's cancel, so no division appears anywhere.

Overflow discipline (the graph.py contract — fail loudly, never wrap):

* input magnitude: |v| < 2³¹ milli-units, ENFORCED per row with
  ``raise_error`` — one squared term then fits int64 (< 2⁶²);
* per-key count: n < 2³⁰ (~10⁹ events per key), ENFORCED on the stats
  frame — then |S| < 2⁶¹ (long sum safe), and Q = Σv² is summed as
  decimal(38,0) (a long sum of 2⁶²-sized terms would wrap at n=2);
* comparison terms: n·Q < 2³⁰·2⁹² … does NOT fit — so the comparison
  is evaluated in decimal(38,0) with the PROVEN bound n·Q < 2³⁰ · n·v²
  < 2³⁰·2³⁰·2⁶² = 2¹²² exceeding 38 digits only for corpora that
  saturate BOTH caps simultaneously; Spark yields NULL (row dropped)
  and DuckDB HUGEINT errors on genuine decimal overflow, so the
  practical contract is: |v| ≤ 2²⁰ milli-units OR n ≤ 2²⁰ keeps every
  term under 10³⁷ exactly. The events gate (|value| ≤ ~500, thousands
  of events per user) sits orders of magnitude inside that envelope.

Scale shape: one shuffle on the key for the (n, S, Q) aggregate (fully
map-side combinable — three scalars per key), then the stats join back
to the event stream on the same key: co-partitioned, AQE broadcasts the
per-key stats side when small. Nothing quadratic, no window over
unbounded partitions, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_ABS_MILLI = 2**31
_MAX_KEY_COUNT = 2**30


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def zscore_outliers(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Events whose milli-quantized value deviates > ``k`` population
    standard deviations from their key's mean, for keys with at least
    ``min_count`` events.

    Returns ``(id_col, key_col, value_milli)`` — one row per outlier
    event. Deterministic and engine-exact: every comparison is integer.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vm = F.round(F.col(value_col) * 1000).cast("long")
    ev = df.select(
        F.col(id_col),
        F.col(key_col),
        F.when(F.abs(vm) < _MAX_ABS_MILLI, vm)
        .otherwise(
            F.raise_error(
                F.format_string(
                    "zscore_outliers: |%s| exceeds 2^31 milli-units; "
                    "rescale before quantizing",
                    vm.cast("string"),
                )
            )
        )
        .alias("value_milli"),
    )
    stats = ev.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("value_milli").alias("_s"),
        # Σv² summed in decimal(38,0): one term is up to 2^62, so a LONG
        # sum would wrap at the second row; decimal is exact to 38 digits
        F.sum(_dec(F.col("value_milli")) * _dec(F.col("value_milli"))).alias("_q"),
    )
    stats = stats.withColumn(
        "_n",
        F.when(F.col("_n") < _MAX_KEY_COUNT, F.col("_n")).otherwise(
            F.raise_error(
                F.format_string(
                    "zscore_outliers: key %s has %s events (>= 2^30); "
                    "pre-aggregate or sample hot keys first",
                    F.col(key_col).cast("string"),
                    F.col("_n").cast("string"),
                )
            )
        ),
    )
    # (n·v − S)² > k²·(n·Q − S²), all decimal(38,0): exact integer math
    lhs_root = _dec(F.col("_n")) * _dec(F.col("value_milli")) - _dec(F.col("_s"))
    rhs = F.lit(k * k).cast("decimal(38,0)") * (
        _dec(F.col("_n")) * F.col("_q") - _dec(F.col("_s")) * _dec(F.col("_s"))
    )
    return (
        ev.join(stats, key_col)
        .where(F.col("_n") >= min_count)
        .where(lhs_root * lhs_root > rhs)
        .select(id_col, key_col, "value_milli")
    )
