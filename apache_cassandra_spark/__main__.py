"""``python -m apache_cassandra_spark <store_root> [catalog.json]`` —
interactive CLI REPL against a local store (reference ``bin/cassandra-cli``
analog)."""

from __future__ import annotations

import os
import sys

from apache_cassandra_spark.catalog import FIXTURE_CATALOG, Catalog
from apache_cassandra_spark.cli import repl
from apache_cassandra_spark.engine import Engine, restore_store_kwargs
from apache_cassandra_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: python -m apache_cassandra_spark <store_root> [catalog.json]")
        sys.exit(2)
    root = sys.argv[1]
    if len(sys.argv) > 2:
        catalog = Catalog.load(sys.argv[2])
    elif os.path.isfile(os.path.join(root, "catalog.json")):
        # existing store: open with ITS persisted schema — never a fixture
        # catalog that would misread real CF comparators / domain_split
        catalog = Catalog.load(os.path.join(root, "catalog.json"))
    else:
        catalog = FIXTURE_CATALOG
    # cluster name + partitioner restore ALWAYS comes from the store's own
    # metadata (the shared CONNECT path): partitioner is store-layout
    # state independent of which catalog the caller passes
    engine = Engine(get_spark(app_name="widecolumn-cli"), root, catalog, **restore_store_kwargs(root))
    print(f"connected: cluster={engine.describe_cluster_name()} keyspaces={engine.describe_keyspaces()}")
    repl(engine)


if __name__ == "__main__":
    main()
