from ai_etl_framework_spark.pipeline.pipeline import Pipeline, PipelineResult

__all__ = ["Pipeline", "PipelineResult"]
