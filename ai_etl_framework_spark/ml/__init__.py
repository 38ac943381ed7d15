"""ML-auxiliary components: run-metrics recording + knob
recommendation (the reference's AutoTuner analog)."""

from ai_etl_framework_spark.ml.autotune import AutoTuner, RunMetrics

__all__ = ["AutoTuner", "RunMetrics"]
