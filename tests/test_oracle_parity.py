"""Local replica of the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB over the same
parquet, compare row-count + column names + order-insensitive values.

This is the highest-signal test in the repo — if it's green at
sf0.001, the driver's sf0.01 gate should be green too.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod

ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _canon(val):
    if val is None:
        return "∅"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # normalize -0.0 and int-valued floats
        if val == 0:
            return "0"
        if abs(val) < 1e-12:
            return "0"
        return f"{val:.9g}"
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    import datetime

    if isinstance(val, datetime.datetime):
        return val.replace(tzinfo=None).isoformat()
    if isinstance(val, datetime.date):
        return val.isoformat()
    return str(val)


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(_canon(r[i]) for i in order))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries(spark, sf_dir):
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
