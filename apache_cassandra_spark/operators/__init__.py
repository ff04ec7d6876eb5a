from apache_cassandra_spark.operators import maintenance, read, write

__all__ = ["maintenance", "read", "write"]
