"""ML-auxiliary components: run-metrics recording + knob
recommendation (the reference's AutoTuner analog)."""

from ai_etl_framework_spark.ml.autotune import AutoTuner, RunMetrics
from ai_etl_framework_spark.ml.echarts import (
    CHART_TYPES,
    add_interactive_features,
    generate_echarts_config,
    generate_multi_series_config,
)

__all__ = [
    "AutoTuner",
    "RunMetrics",
    "CHART_TYPES",
    "add_interactive_features",
    "generate_echarts_config",
    "generate_multi_series_config",
]
