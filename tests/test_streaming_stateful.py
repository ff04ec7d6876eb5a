"""Stateful LWW materialization via applyInPandasWithState: later batches
with OLDER timestamps must not override state (the memtable resolve rule,
incrementalized)."""

import json

from apache_cassandra_spark.streaming.ingest import mutation_stream
from apache_cassandra_spark.streaming.stateful import lww_updates


def write_batch(path, name, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stateful_lww_across_batches(spark, tmp_path):
    src = tmp_path / "muts"
    # batch 1: ts 5; batch 2: an OLDER write (ts 3, must emit nothing for k1)
    # and a newer write for k2
    write_batch(
        src,
        "b1.json",
        [
            {"key": "k1", "sc": None, "column": "63", "value": "6131", "ts": 5, "tombstone": False, "ldt": None},
            {"key": "k2", "sc": None, "column": "63", "value": "6231", "ts": 1, "tombstone": False, "ldt": None},
        ],
    )
    write_batch(
        src,
        "b2.json",
        [
            {"key": "k1", "sc": None, "column": "63", "value": "6f6c64", "ts": 3, "tombstone": False, "ldt": None},
            {"key": "k2", "sc": None, "column": "63", "value": "6232", "ts": 9, "tombstone": False, "ldt": None},
        ],
    )
    cells = mutation_stream(spark, str(src), max_files_per_trigger=1)
    out = lww_updates(cells.drop("ldt"))

    batches = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: batches.append((bid, [tuple(r) for r in df.collect()])))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = [r for _, rows in batches for r in rows]
    by_key = {}
    for key, sc, column, value, ts, tomb in emitted:
        by_key.setdefault(key, []).append((bytes(value), ts))
    # k1: only the ts=5 write ever emitted (older ts=3 lost to state)
    assert by_key["k1"] == [(b"a1", 5)]
    # k2: both emissions, each a state improvement
    assert by_key["k2"] == [(b"b1", 1), (b"b2", 9)]
