from ai_etl_framework_spark.pipeline.ingest import IncrementalCorpusIngest
from ai_etl_framework_spark.pipeline.pipeline import Pipeline, PipelineResult

__all__ = ["IncrementalCorpusIngest", "Pipeline", "PipelineResult"]
