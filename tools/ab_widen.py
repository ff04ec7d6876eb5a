"""Same-process interleaved A/B of the load_table scan-widening exchange.

Usage: python tools/ab_widen.py [-n reps] <query> [query ...]

Mode A = widening as shipped; mode B = widening disabled (threshold -> inf,
memo cleared). Interleaves A,B,A,B,... per rep so ambient drift hits both
modes equally; prints per-mode medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from apache_cassandra_spark import queries as Q
from apache_cassandra_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_widen")
    normal = Q._WIDEN_MIN_BYTES

    def set_mode(widen_on: bool) -> None:
        Q._WIDEN_MIN_BYTES = normal if widen_on else (1 << 60)
        Q._SCAN_WIDTH.clear()

    for name in args:
        fn = Q.QUERIES[name]
        # one warmup per mode
        for on in (True, False):
            set_mode(on)
            spark.catalog.clearCache()
            fn(spark, sf_dir).count()
        times: dict[bool, list[float]] = {True: [], False: []}
        for i in range(reps):
            for on in (True, False):
                set_mode(on)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"ab:{name}:{'A' if on else 'B'}{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times[on].append(time.perf_counter() - t0)
        ma, mb = statistics.median(times[True]), statistics.median(times[False])
        print(
            f"{name}: widen={ma:.3f}s nowiden={mb:.3f}s ratio={ma/mb:.2f} "
            f"A={[round(t,2) for t in times[True]]} B={[round(t,2) for t in times[False]]}",
            flush=True,
        )
    set_mode(True)


if __name__ == "__main__":
    main()
