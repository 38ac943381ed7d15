"""Materialize analyzer metadata into stable, rounded data columns.

Reference: src/transformers/enrichers/metadata_to_columns.py:15-130 —
the reference copies record *metadata* into data fields so sinks see
them. Our analyzers already emit `_meta_*` columns natively, so this
operator's observable contract is the normalization the reference
applied on the way through:

- `_meta_quality_score`, `_meta_completeness`, `_meta_validity`,
  `_meta_consistency` rounded to 4 decimals (ref :99-115)
- `_meta_anomaly_reasons`: array values joined with "; " (ref :87)
- missing columns are added with NULL (False for the anomaly flag) so
  the output schema is stable regardless of which analyzers ran —
  matching the reference's fixed column set.

Pure projection — no shuffle, folds into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROUND4_COLS = [
    "_meta_quality_score",
    "_meta_completeness",
    "_meta_validity",
    "_meta_consistency",
]


class MetadataToColumns:
    def __init__(self, include_quality: bool = True, include_anomaly: bool = True) -> None:
        self.include_quality = include_quality
        self.include_anomaly = include_anomaly

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df
        if self.include_quality:
            for c in ROUND4_COLS:
                if c in out.columns:
                    out = out.withColumn(c, F.round(F.col(c), 4))
                else:
                    out = out.withColumn(c, F.lit(None).cast("double"))
        if self.include_anomaly:
            if "_meta_is_anomaly" in out.columns:
                out = out.withColumn(
                    "_meta_is_anomaly", F.coalesce(F.col("_meta_is_anomaly"), F.lit(False))
                )
            else:
                out = out.withColumn("_meta_is_anomaly", F.lit(False))
            if "_meta_anomaly_method" not in out.columns:
                out = out.withColumn("_meta_anomaly_method", F.lit(None).cast("string"))
            if "_meta_anomaly_reasons" in out.columns:
                dt = out.schema["_meta_anomaly_reasons"].dataType
                if isinstance(dt, T.ArrayType):
                    out = out.withColumn(
                        "_meta_anomaly_reasons",
                        F.concat_ws("; ", F.col("_meta_anomaly_reasons")),
                    )
            else:
                out = out.withColumn("_meta_anomaly_reasons", F.lit(None).cast("string"))
        return out
