from ai_etl_framework_spark.streaming.cdc import (
    apply_cdc_batch,
    apply_cdc_stream,
    latest_per_key,
)
from ai_etl_framework_spark.streaming.events import (
    read_stream,
    windowed_counts,
    windowed_counts_batch,
)

__all__ = [
    "apply_cdc_batch",
    "apply_cdc_stream",
    "latest_per_key",
    "read_stream",
    "windowed_counts",
    "windowed_counts_batch",
]
