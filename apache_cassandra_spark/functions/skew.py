"""Skew-handling primitives: salted two-phase aggregation and the
replicate-salt join.

At 100 TB, zipf-headed keys turn one reduce partition into the job's
critical path. Spark's own mitigations cover most cases — map-side
partial aggregation, and AQE's `skewJoin` partition splitting — but two
gaps remain where explicit salting is the standard fix:

* **Aggregation**: partial (map-side) aggregation degrades to
  pass-through when a task's grouping-key working set overflows the
  hash-aggregate map (high-cardinality grouping with a zipf head —
  n-gram counts, per-URL stats). Salting guarantees the hot key's rows
  spread over ``n_salts`` reduce partitions regardless of partial-agg
  behavior, at the cost of a second (tiny, group-count-sized) shuffle.
* **Join**: AQE splits oversized *partitions*, but a replicated-salt
  join also handles the case where one side must be rebuilt
  deterministically (no runtime stats), and is the only portable shape
  on engines without AQE.

Both transforms are RESULT-PRESERVING — the salt is internal plumbing
that never escapes — so each is oracle-gated against its unsalted ANSI
SQL equivalent.

Salts are deterministic (`uniform_hash` — md5-derived), never `rand()`:
task retries must land each row in the same salt bucket or shuffle
retries double-count. A NULL `salt_on` value hashes via a sentinel
(md5(NULL) is NULL, which would make the salt-equality predicate never
match and silently drop the row from a salted join — breaking the
result-preserving contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_cassandra_spark.functions.hashing import uniform_hash


def _salt(col: str | Column, n_salts: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return uniform_hash(F.coalesce(c.cast("string"), F.lit("\x00:null")), n_salts)

#: re-aggregable (algebraic) aggregates: second phase re-applies a merge
#: aggregate over the per-salt partials
_MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

def _salt_name(*frames: DataFrame) -> str:
    """A working-column name free in every given frame — a user column
    literally named `_salt` must survive the transform untouched."""
    taken = {c for f in frames for c in f.columns}
    name = "_salt"
    while name in taken:
        name = "_" + name
    return name


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: ``groupBy(keys + salt)`` partials,
    then ``groupBy(keys)`` merge. Exact for algebraic aggregates.

    ``aggs``: output column -> (fn, input column) with fn in
    {sum, count, min, max}. ``count`` counts rows per group (input
    column ignored at phase 1, partials summed at phase 2).

    ``salt_on``: column whose hash spreads the hot key's rows (default: a
    row-unique expression is required from the caller — pass e.g. the
    row id). The salt must NOT be derived from the grouping keys alone,
    or every row of a key lands in one bucket and nothing spreads.

    Scale shape: shuffle #1 is on (keys, salt) — the hot key fans out
    over ``n_salts`` partitions; shuffle #2 moves only one row per
    (key, salt), i.e. |groups| × n_salts rows, negligible. Plan is two
    HashAggregates (all listed aggregates are hash-aggregable).
    """
    if salt_on is None:
        raise ValueError("salt_on is required: a row-level column/expression to hash")
    unknown = {fn for fn, _ in aggs.values()} - set(_MERGEABLE)
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) {sorted(unknown)}: cannot salt")

    phase1 = [
        (F.count(F.lit(1)) if fn == "count" else _MERGEABLE[fn](col)).alias(out)
        for out, (fn, col) in aggs.items()
    ]
    salt_col = _salt_name(df)
    partial = (
        df.withColumn(salt_col, _salt(salt_on, n_salts))
        .groupBy(*keys, salt_col)
        .agg(*phase1)
    )
    phase2 = [
        (F.sum(out) if fn in ("sum", "count") else _MERGEABLE[fn](out)).alias(out)
        for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Replicate-salt equi-join for a skewed big side: the big side gets
    ``salt = hash(row) % n``, the small side is replicated n× with every
    salt value, and the join runs on ``on + [salt]`` — the hot key's
    rows spread over ``n_salts`` partitions instead of one.

    ``on``: [(big_col, small_col), ...] equi-join keys. ``salt_on``: a
    row-level big-side column/expression (must not be only the join key
    — see `salted_agg`). ``how``: inner or left_outer (left rows match
    exactly one replica, so multiplicities are preserved).

    Cost model: small side shuffles n× its size — worth it only when
    the small side is too big to broadcast AND the key histogram is
    zipf; for broadcast-sized dims use `F.broadcast` instead (this
    module is the fallback, not the default).
    """
    if salt_on is None:
        raise ValueError("salt_on is required: a row-level column/expression to hash")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"unsupported how={how!r}: salting replicates the small side")

    salt_col = _salt_name(big, small)
    salted_big = big.withColumn(salt_col, _salt(salt_on, n_salts))
    replicas = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = [salted_big[b] == replicas[s] for b, s in on]
    cond.append(salted_big[salt_col] == replicas[salt_col])
    joined = salted_big.join(replicas, cond, how)
    return joined.drop(salted_big[salt_col]).drop(replicas[salt_col])
