from apache_cassandra_spark.functions.comparators import AbstractComparator, get_comparator
from apache_cassandra_spark.functions.reconcile import live_view, reconcile
from apache_cassandra_spark.functions.tokens import get_partitioner

__all__ = ["AbstractComparator", "get_comparator", "get_partitioner", "live_view", "reconcile"]
