from ai_etl_framework_spark.api.handlers import PipelineApiService

__all__ = ["PipelineApiService"]
