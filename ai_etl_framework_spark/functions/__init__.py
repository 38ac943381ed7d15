"""Training-data pipeline functions: text analysis, similarity search,
multimodal column plumbing. All JVM-side expressions unless a Pandas
UDF is genuinely required (multimodal decode)."""

from ai_etl_framework_spark.functions import text, similarity, multimodal

__all__ = ["text", "similarity", "multimodal"]
