"""ADVICE r7 adjudication: integer division parity between Spark `div`
and DuckDB `//` for the gap-fill day-index arithmetic.

The advisory flagged q_events_gap_fill as divergent for negative
(pre-1970) timestamps on the claim that DuckDB `//` floors while Spark
`div` truncates toward zero. Measured on the pinned duckdb 1.0.0, that
claim is wrong in both parts: on BIGINT operands `//` truncates toward
zero exactly like Spark's `div` (-7 // 2 = -3 in both, not floor's -4),
and on FLOAT/DECIMAL operands `//` is not integer division at all — it
degrades to plain division (-7.0 // 2 = -3.5). The gate's oracle feeds
`//` with epoch_us(ts) — a BIGINT — so the two engines agree for ALL
timestamps, negative included. This test pins that fact on the
exact composed expression both sides use, over a sign-crossing grid
including the truncation-vs-floor witnesses, so an engine upgrade that
changes either semantic fails loudly instead of silently shifting
pre-1970 rows across day buckets.
"""

import duckdb


def test_day_index_arithmetic_agrees_across_engines(spark):
    ns_per_s, s_per_day = 1_000_000_000, 86_400
    witnesses = [
        -2 * s_per_day * ns_per_s - 1,  # mid pre-1970 day
        -s_per_day * ns_per_s,          # exact negative day boundary
        -s_per_day * ns_per_s + 1,
        -1,                             # 1 ns before epoch: trunc->0, floor->-1
        0,
        1,
        s_per_day * ns_per_s - 1,
        s_per_day * ns_per_s,
        1_700_000_000 * ns_per_s + 123_456_789,  # modern ts, sub-second residue
    ]
    df = spark.createDataFrame([(t,) for t in witnesses], "ts long")
    got = {
        r["ts"]: r["day_idx"]
        for r in df.selectExpr(
            "ts", "ts div 1000000000 div 86400 AS day_idx"
        ).collect()
    }
    con = duckdb.connect()
    for t in witnesses:
        # the oracle's shape: epoch_us (BIGINT) // 1000000 // 86400;
        # epoch_us(ts) == ts_ns // 1000 with ns stored as integer micros
        # in the parquet, so feed the same integer value
        (want,) = con.execute(
            f"SELECT ({t} // 1000000000) // 86400"
        ).fetchone()
        assert got[t] == want, (t, got[t], want)
