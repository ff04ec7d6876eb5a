"""``python -m apache_cassandra_spark <store_root> [catalog.json]`` —
interactive CLI REPL against a local store (reference ``bin/cassandra-cli``
analog)."""

from __future__ import annotations

import json
import os
import sys

from apache_cassandra_spark.catalog import FIXTURE_CATALOG, Catalog
from apache_cassandra_spark.cli import repl
from apache_cassandra_spark.engine import Engine
from apache_cassandra_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: python -m apache_cassandra_spark <store_root> [catalog.json]")
        sys.exit(2)
    root = sys.argv[1]
    kwargs = {}
    if len(sys.argv) > 2:
        catalog = Catalog.load(sys.argv[2])
    elif os.path.isfile(os.path.join(root, "catalog.json")):
        # existing store: open with ITS persisted schema + cluster metadata
        # (same restore path CONNECT uses) — never a fixture catalog that
        # would misread real CF comparators / domain_split / processors
        catalog = Catalog.load(os.path.join(root, "catalog.json"))
        cl_path = os.path.join(root, "cluster.json")
        if os.path.isfile(cl_path):
            with open(cl_path) as fh:
                meta = json.load(fh)
            kwargs["cluster_name"] = meta["cluster_name"]
            if meta.get("partitioner"):
                from apache_cassandra_spark.functions.tokens import get_partitioner

                kwargs["partitioner"] = get_partitioner(meta["partitioner"])
    else:
        catalog = FIXTURE_CATALOG
    engine = Engine(get_spark(app_name="widecolumn-cli"), root, catalog, **kwargs)
    print(f"connected: cluster={engine.describe_cluster_name()} keyspaces={engine.describe_keyspaces()}")
    repl(engine)


if __name__ == "__main__":
    main()
