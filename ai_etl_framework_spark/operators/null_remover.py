"""Null handling with the reference's ""≡NULL rule.

Reference: src/transformers/cleaners/null_remover.py.

Strategies:
- ``drop``       drop row if ANY considered value is NULL or "" (ref :54-58, 92-94)
- ``drop_all``   drop row only if ALL considered values are NULL/"" (ref :60-64, 96-98)
- ``fill``       replace NULL/"" with ``fill_value`` (ref :74-80)
- ``remove_fields``  reference deletes null keys PER RECORD (ragged
  rows, ref :66-72) — impossible in a columnar model. Deliberate
  divergence (SURVEY §7.4.2): values stay NULL, and columns that are
  100% null/empty are dropped, which matches the observable output of
  the reference's flagship pipeline (wholly-empty columns vanish).

The ""≡NULL normalization is applied *inside* this operator only —
loaders elsewhere still round-trip empty strings untouched.

Scale notes: drop/fill are narrow per-row expressions (no shuffle).
``remove_fields`` needs one aggregate pass to find the all-null
columns — a single map-side-combined job, then a metadata-only
projection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STRATEGIES = {"drop", "drop_all", "fill", "remove_fields"}


def _is_nullish(df: DataFrame, name: str) -> Column:
    """NULL, or empty string for string columns (""≡NULL, ref :92-98)."""
    c = F.col(name)
    if isinstance(df.schema[name].dataType, T.StringType):
        return c.isNull() | (c == F.lit(""))
    return c.isNull()


class NullRemover:
    def __init__(
        self,
        strategy: str = "drop",
        fields: Optional[Sequence[str]] = None,
        fill_value: Any = None,
    ) -> None:
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy: {strategy!r}")
        self.strategy = strategy
        self.fields = list(fields) if fields else None
        self.fill_value = fill_value

    def __call__(self, df: DataFrame) -> DataFrame:
        cols = self.fields or df.columns
        nullish = [_is_nullish(df, c) for c in cols]
        any_nullish = None
        all_nullish = None
        for p in nullish:
            any_nullish = p if any_nullish is None else (any_nullish | p)
            all_nullish = p if all_nullish is None else (all_nullish & p)

        if self.strategy == "drop":
            return df.filter(~any_nullish) if any_nullish is not None else df
        if self.strategy == "drop_all":
            return df.filter(~all_nullish) if all_nullish is not None else df
        if self.strategy == "fill":
            out = df
            for name in cols:
                c = F.col(name)
                dt = df.schema[name].dataType
                fill = F.lit(self.fill_value)
                if isinstance(dt, T.StringType):
                    repl = F.when(c.isNull() | (c == ""), fill.cast("string")).otherwise(c)
                else:
                    repl = F.coalesce(c, fill.cast(dt))
                out = out.withColumn(name, repl)
            return out
        # remove_fields: drop columns that are entirely null/empty
        counts = df.agg(
            *[F.sum(F.when(_is_nullish(df, c), 0).otherwise(1)).alias(c) for c in cols]
        ).collect()[0]
        dead = [c for c in cols if (counts[c] or 0) == 0]
        return df.drop(*dead) if dead else df
