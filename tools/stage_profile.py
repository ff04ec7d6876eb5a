"""Stage-level profiler (guide §1.1 empirical loop, UI-free): run a
declared query once (after a warmup), then read the driver's in-process
AppStatusStore — the same store the Spark UI renders — and print per
stage: wall time, task count, executor run/CPU time, shuffle bytes and
input bytes, sorted by wall time. Substitutes for the UI's Stages tab in
the sandbox (spark.ui.enabled=false; the event log needs commons-io,
absent from this build).

Usage: python tools/stage_profile.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from apache_cassandra_spark.queries import QUERIES
from apache_cassandra_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stage_profile")
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm

    def stage_list():
        # Spark 4.x signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus)
        gw = spark.sparkContext._gateway
        quant = gw.new_array(jvm.double, 0)
        return store.stageList(
            jvm.java.util.ArrayList(), False, False, quant, jvm.java.util.ArrayList()
        )

    for name in sys.argv[1:]:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()  # warmup (absorbs codegen/page-cache)
        spark.catalog.clearCache()
        first_after = stage_list().size()  # stages so far (list is newest-first)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        sl = stage_list()
        n_new = sl.size() - first_after
        rows = []
        for i in range(n_new):  # newest-first: the timed run's stages
            s = sl.apply(i)
            sub = s.submissionTime()
            comp = s.completionTime()
            wall = 0
            if sub.isDefined() and comp.isDefined():
                wall = comp.get().getTime() - sub.get().getTime()
            rows.append(
                {
                    "id": s.stageId(),
                    "wall": wall,
                    "tasks": s.numCompleteTasks(),
                    "run": s.executorRunTime(),
                    "cpu": s.executorCpuTime() // 1_000_000,
                    "shR": s.shuffleReadBytes() // 1024,
                    "shRrec": s.shuffleReadRecords(),
                    "shW": s.shuffleWriteBytes() // 1024,
                    "shWrec": s.shuffleWriteRecords(),
                    "in": s.inputBytes() // 1024,
                    "name": s.name(),
                }
            )
        print(f"{name}: timed run {dt:.3f}s — {n_new} stages")
        for r in sorted(rows, key=lambda r: -r["wall"])[:15]:
            print(
                f"  st{r['id']:>5} wall={r['wall']:>6}ms tasks={r['tasks']:>3} "
                f"run={r['run']:>6}ms cpu={r['cpu']:>6}ms "
                f"shR={r['shR']:>6}K/{r['shRrec']:>8} shW={r['shW']:>6}K/{r['shWrec']:>8} "
                f"in={r['in']:>7}K  {r['name'][:48]}"
            )


if __name__ == "__main__":
    main()
