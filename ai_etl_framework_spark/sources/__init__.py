from ai_etl_framework_spark.sources.readers import (
    read_binary,
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    with_row_id,
)
from ai_etl_framework_spark.sources.paths import slugify, generate_outputs

__all__ = [
    "read_binary",
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text",
    "with_row_id",
    "slugify",
    "generate_outputs",
]
