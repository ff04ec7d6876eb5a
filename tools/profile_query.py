"""Per-query wall-clock profiler: warmup + N timed runs of a declared
query's bench action (.count(), matching bench.py), with per-run seconds.

Usage: python tools/profile_query.py [-n reps] <query> [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from apache_cassandra_spark.queries import QUERIES
from apache_cassandra_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_query")
    for name in args:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        times, builds = [], []
        for i in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            times.append(time.perf_counter() - t0)
            builds.append(t1 - t0)
        med = statistics.median(times)
        medb = statistics.median(builds)
        print(
            f"{name}: median={med:.3f}s (build {medb:.3f}s)  "
            f"runs={[round(t, 3) for t in times]}  warmup={warm:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
