from ai_etl_framework_spark.sources.readers import read_csv, read_json, read_parquet, read_jdbc, with_row_id
from ai_etl_framework_spark.sources.paths import slugify, generate_outputs

__all__ = ["read_csv", "read_json", "read_parquet", "read_jdbc", "with_row_id", "slugify", "generate_outputs"]
