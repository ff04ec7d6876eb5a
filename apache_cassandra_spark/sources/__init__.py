from apache_cassandra_spark.sources.cellstore import CELL_SCHEMA, CONTAINER_TOMBSTONE_SCHEMA, CellStore
from apache_cassandra_spark.sources.ingest import cells_from_table, cf_from_table

__all__ = ["CELL_SCHEMA", "CONTAINER_TOMBSTONE_SCHEMA", "CellStore", "cells_from_table", "cf_from_table"]
