"""Same-process interleaved A/B of a runtime-settable SQL conf.

Usage: python tools/ab_conf.py [-n reps] key=value [key=value ...] -- <query> [query ...]

Mode A = session defaults (session.py); mode B = the given confs set.
Interleaves A,B,A,B,... per rep so ambient drift hits both modes equally;
prints per-mode medians. Only works for confs Spark allows to change at
runtime (SQL confs); core confs (spark.io.*) need separate processes.
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
    sep = args.index("--")
    confs = dict(a.split("=", 1) for a in args[:sep])
    names = args[sep + 1 :]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_conf")
    baseline = {k: spark.conf.get(k, None) for k in confs}

    def set_mode(b_on: bool) -> None:
        for k in confs:
            if b_on:
                spark.conf.set(k, confs[k])
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    for name in names:
        fn = Q.QUERIES[name]
        for on in (False, True):  # one warmup per mode
            set_mode(on)
            spark.catalog.clearCache()
            fn(spark, sf_dir).count()
        times: dict[bool, list[float]] = {True: [], False: []}
        for i in range(reps):
            for on in (False, True):
                set_mode(on)
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"abconf:{name}:{'B' if on else 'A'}{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times[on].append(time.perf_counter() - t0)
        ma, mb = statistics.median(times[False]), statistics.median(times[True])
        print(
            f"{name}: base={ma:.3f}s conf={mb:.3f}s ratio(conf/base)={mb/ma:.2f} "
            f"A={[round(t, 2) for t in times[False]]} B={[round(t, 2) for t in times[True]]}",
            flush=True,
        )
    set_mode(False)


if __name__ == "__main__":
    main()
