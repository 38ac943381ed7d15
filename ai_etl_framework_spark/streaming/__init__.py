from ai_etl_framework_spark.streaming.events import read_stream, windowed_counts, windowed_counts_batch

__all__ = ["read_stream", "windowed_counts", "windowed_counts_batch"]
