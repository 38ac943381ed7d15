"""Name-driven column removal.

Reference: src/transformers/cleaners/column_remover.py:15-166
(matching logic :86-112). Precedence preserved exactly:
keep_columns overrides everything, then exact set, then prefix, then
regex.

Pure metadata operation — a projection Catalyst folds into the scan
(column pruning), zero runtime cost at any scale.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame


class ColumnRemover:
    def __init__(
        self,
        columns: Optional[Sequence[str]] = None,
        prefix: Optional[str] = None,
        pattern: Optional[str] = None,
        keep_columns: Optional[Sequence[str]] = None,
    ) -> None:
        self.columns = set(columns or [])
        self.prefix = prefix
        self.pattern = re.compile(pattern) if pattern else None
        self.keep = set(keep_columns or [])

    def should_remove(self, name: str) -> bool:
        if name in self.keep:  # keep wins (ref :86-112)
            return False
        if name in self.columns:
            return True
        if self.prefix and name.startswith(self.prefix):
            return True
        if self.pattern and self.pattern.search(name):
            return True
        return False

    def __call__(self, df: DataFrame) -> DataFrame:
        drop = [c for c in df.columns if self.should_remove(c)]
        return df.drop(*drop) if drop else df
