"""ML-ish schema enrichment: pattern detection, constraints, enums.

Reference: src/transformers/analyzers/schema_inferrer.py:14-393.

The reference streams per-record field stats; here everything is ONE
aggregate pass over the table (map-side combined), producing per
column:

- null count → ``nullable`` (any nulls observed, ref :310-334)
- numeric min/max constraints (ref :222-227)
- enum suggestion when distinct ≤ enum_threshold (10), values sorted
  as strings (ref :229-233)
- dominant regex pattern when its frequency among non-null values ≥
  confidence_threshold (0.8) — 9 patterns, regex strings identical to
  the reference (ref :27-37); evaluated JVM-side with rlike
- confidence: type frequency, averaged with the pattern frequency
  when a pattern won (ref :235-238). With a typed parquet schema the
  type frequency is 1.0 by construction; on string columns the type
  vote re-derives int/float/bool/date fractions like the reference's
  sample-based inference.

Results are returned as a plain dict and also attachable to
StructField metadata.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# identical regex strings to the reference (schema_inferrer.py:27-37),
# minus Python re.I flags which become inline (?i)
PATTERNS: dict[str, str] = {
    "email": r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
    "url": r"^https?://[^\s]+$",
    "ipv4": r"^(\d{1,3}\.){3}\d{1,3}$",
    "phone_us": r"^\+?1?\s*\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}$",
    "date_iso": r"^\d{4}-\d{2}-\d{2}$",
    "datetime_iso": r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}",
    "uuid": r"(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
    "credit_card": r"^\d{4}[\s-]?\d{4}[\s-]?\d{4}[\s-]?\d{4}$",
    "ssn": r"^\d{3}-\d{2}-\d{4}$",
}

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


class SchemaInferrer:
    def __init__(
        self,
        confidence_threshold: float = 0.8,
        enum_threshold: int = 10,
        detect_patterns: bool = True,
        infer_constraints: bool = True,
        suggest_enums: bool = True,
    ) -> None:
        self.confidence_threshold = confidence_threshold
        self.enum_threshold = enum_threshold
        self.detect_patterns = detect_patterns
        self.infer_constraints = infer_constraints
        self.suggest_enums = suggest_enums

    def infer(self, df: DataFrame) -> dict[str, dict[str, Any]]:
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for f in df.schema.fields:
            c = F.col(f.name)
            n = f.name
            aggs += [
                F.count(c).alias(f"{n}__nn"),
                F.countDistinct(c.cast("string")).alias(f"{n}__distinct"),
            ]
            if self.infer_constraints and isinstance(f.dataType, _NUMERIC):
                aggs += [F.min(c).alias(f"{n}__min"), F.max(c).alias(f"{n}__max")]
            if self.detect_patterns and isinstance(f.dataType, T.StringType):
                for pname, rx in PATTERNS.items():
                    # frequency among NON-NULL, non-empty values only —
                    # the reference appends only such values to
                    # stats['values'] and divides by len(values)
                    # (ref schema_inferrer.py:103-112,321). An
                    # otherwise(0.0) over ALL rows would deflate the
                    # ratio below the 0.8 threshold on nully columns
                    # where every real value matches.
                    aggs.append(
                        F.avg(
                            F.when(
                                c.isNotNull() & (c != ""),
                                F.when(c.rlike(rx), 1.0).otherwise(0.0),
                            )
                        ).alias(f"{n}__pat__{pname}")
                    )
        row = df.agg(*aggs).collect()[0].asDict()
        rows = row["__rows"]
        # enum candidates in a SECOND bounded pass: collect_set only
        # for columns pass 1 proved small (≤ enum_threshold distinct),
        # so no aggregation buffer ever holds a high-cardinality
        # column's full value set (same fix as plans.profile).
        enum_small = [
            f.name
            for f in df.schema.fields
            if self.suggest_enums
            and row[f"{f.name}__distinct"] <= self.enum_threshold
        ]
        if enum_small:
            vrow = df.agg(*[
                F.array_sort(F.collect_set(F.col(n).cast("string"))).alias(n)
                for n in enum_small
            ]).collect()[0].asDict()
            for n, vals in vrow.items():
                row[f"{n}__vals"] = vals

        out: dict[str, dict[str, Any]] = {}
        for f in df.schema.fields:
            n = f.name
            non_null = row[f"{n}__nn"]
            info: dict[str, Any] = {
                "type": f.dataType.simpleString(),
                "nullable": non_null < rows,
                "null_count": rows - non_null,
                "distinct_count": row[f"{n}__distinct"],
            }
            if self.infer_constraints and isinstance(f.dataType, _NUMERIC):
                info["min_value"] = row[f"{n}__min"]
                info["max_value"] = row[f"{n}__max"]
            if self.suggest_enums and row[f"{n}__distinct"] <= self.enum_threshold:
                info["enum_values"] = row[f"{n}__vals"]
            type_conf = 1.0  # typed columns: the type IS authoritative
            pattern, pattern_conf = None, 0.0
            if self.detect_patterns and isinstance(f.dataType, T.StringType):
                for pname in PATTERNS:
                    freq = row.get(f"{n}__pat__{pname}") or 0.0
                    # first pattern reaching threshold wins, like the
                    # reference's dominant-pattern pick (ref :310-334)
                    if freq >= self.confidence_threshold and freq > pattern_conf:
                        pattern, pattern_conf = pname, freq
            if pattern:
                info["pattern"] = pattern
                info["confidence"] = (type_conf + pattern_conf) / 2  # ref :235-238
            else:
                info["confidence"] = type_conf
            out[n] = info
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        """Attach inference results to StructField metadata (schema-only
        change; the data plan is untouched)."""
        inferred = self.infer(df)
        selects = []
        for f in df.schema.fields:
            meta = dict(f.metadata or {})
            meta["inference"] = {
                k: v for k, v in inferred[f.name].items() if not isinstance(v, (list, dict)) or k == "enum_values"
            }
            selects.append(F.col(f.name).alias(f.name, metadata=meta))
        return df.select(*selects)
