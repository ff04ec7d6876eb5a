"""``python -m apache_cassandra_spark <store_root> [catalog.json]`` —
interactive CLI REPL against a local store (reference ``bin/cassandra-cli``
analog)."""

from __future__ import annotations

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
    catalog = Catalog.load(sys.argv[2]) if len(sys.argv) > 2 else FIXTURE_CATALOG
    engine = Engine(get_spark(app_name="widecolumn-cli"), root, catalog)
    print(f"connected: cluster={engine.describe_cluster_name()} keyspaces={engine.describe_keyspaces()}")
    repl(engine)


if __name__ == "__main__":
    main()
