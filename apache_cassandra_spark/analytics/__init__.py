"""Large-scale training-data pipeline operators over CF / parquet tables.

This is the layer the reference delegated to Hadoop/Pig (SURVEY.md §2.6) —
here it's native Spark SQL, plus the LLM-data operators mandated by
BASELINE.json: deduplication, similarity search, text analysis, multimodal
column plumbing. Everything is built on DataFrame expressions (JVM-side,
codegen) except the genuinely imperative parts (media decode), which use
Arrow-batched pandas UDFs.

Determinism contract: all hashing is md5-based (not Spark's murmur3) so
every operator is reproducible in ANSI SQL — the driver's DuckDB oracle
validates these operators bit-for-bit.
"""

from apache_cassandra_spark.analytics import dedup, graph, multimodal, similarity, text

__all__ = ["dedup", "graph", "multimodal", "similarity", "text"]
