from apache_cassandra_spark.streaming.ingest import (
    mutation_stream,
    stream_into_store,
    windowed_event_stats,
)

__all__ = ["mutation_stream", "stream_into_store", "windowed_event_stats"]
