"""Pipeline transformers, re-expressed as DataFrame → DataFrame functions.

Every operator here is a *library* function emitting standard Column
expressions — no Catalyst extensions, no RDDs, no driver-side row
loops — so the optimizer sees through them (pushdown, pruning,
whole-stage codegen all apply).
"""

from ai_etl_framework_spark.operators.null_remover import NullRemover
from ai_etl_framework_spark.operators.column_remover import ColumnRemover
from ai_etl_framework_spark.operators.aggregator import Aggregator
from ai_etl_framework_spark.operators.dedup import Deduplicator
from ai_etl_framework_spark.operators.quality import QualityScorer
from ai_etl_framework_spark.operators.anomaly import AnomalyDetector, AnomalySplitter
from ai_etl_framework_spark.operators.rollups import DashboardAggregator
from ai_etl_framework_spark.operators.schema_inferrer import SchemaInferrer
from ai_etl_framework_spark.operators.metadata_columns import MetadataToColumns
from ai_etl_framework_spark.operators.merge import merge_upsert, scd2_apply
from ai_etl_framework_spark.operators.corpus import (
    contamination_pairs,
    corpus_quality,
    decontaminate,
)
from ai_etl_framework_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    pack_documents,
    shuffle_deterministic,
    stratified_quota,
    upsample,
    temperature_weights,
    weighted_mixture,
)

__all__ = [
    "contamination_pairs",
    "corpus_quality",
    "decontaminate",
    "deterministic_sample",
    "hash_split",
    "merge_upsert",
    "scd2_apply",
    "pack_documents",
    "shuffle_deterministic",
    "stratified_quota",
    "upsample",
    "temperature_weights",
    "weighted_mixture",
    "MetadataToColumns",
    "NullRemover",
    "ColumnRemover",
    "Aggregator",
    "Deduplicator",
    "QualityScorer",
    "AnomalyDetector",
    "AnomalySplitter",
    "DashboardAggregator",
    "SchemaInferrer",
]
