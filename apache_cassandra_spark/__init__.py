"""apache_cassandra_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of odnoklassniki/apache-cassandra
(a Cassandra 0.6.13 production fork).

Architecture (see SURVEY.md §7):

* Every column family materializes as a DataFrame in the canonical **cell
  layout** ``(key, sc, column, value, ts, tombstone, ldt)`` plus a side table
  of container (row / supercolumn) tombstones.
* Reads build the **reconciled live view**: union of base + delta cells,
  grouped by coordinate, winner picked with the exact last-write-wins
  priority of ``db/Column.java:196-210`` (timestamp, then tombstone wins
  ties, then larger value wins), shadowed by container tombstones
  (``db/ColumnFamilyStore.java:1036-1045``), then tombstones filtered.
* All client operators (the Thrift surface of
  ``interface/cassandra.thrift:290-464``) compile to DataFrame expressions
  over that view; Catalyst supplies pushdown / pruning / codegen.

Nothing here is a port of the reference's Java execution engine — the
reference defines WHAT to compute, Spark decides HOW.
"""

from apache_cassandra_spark.catalog import CFDef, Catalog, KeyspaceDef
from apache_cassandra_spark.model import CF, ColumnPath, Deletion, Mutation, SlicePredicate, SliceRange
from apache_cassandra_spark.session import get_spark

__all__ = [
    "CF",
    "CFDef",
    "Catalog",
    "ColumnPath",
    "Deletion",
    "KeyspaceDef",
    "Mutation",
    "SlicePredicate",
    "SliceRange",
    "get_spark",
]

__version__ = "0.1.0"
