"""Dump .explain("formatted") for declared queries to plans/<tag>/<query>.txt.

Usage: python tools/capture_plans.py <tag> [query ...]
e.g.   python tools/capture_plans.py r14_before dedup_groups_star sim_pq_topk

Plan-construction caveat: iterative operators (dup_groups_star, hits,
k_core/coreness, kmeans) execute their fixpoint rounds eagerly at
DataFrame-construction time, so their dump reflects only the final join —
the plan files for those are supplemented with per-round notes in
OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from apache_cassandra_spark.queries import QUERIES
from apache_cassandra_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("plans", tag.split("_")[0])
    suffix = tag.split("_", 1)[1] if "_" in tag else tag
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        spark.catalog.clearCache()
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the artifact
            plan = f"PLAN CAPTURE FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
