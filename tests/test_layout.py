"""Z-order layout (operators/layout.py): pinned bit-interleaving vs an
independent Python Morton model, quantization/clamp/NULL semantics,
validation, and the PROPERTY the operator exists for — a selective
rectangle over z-ordered data touches far fewer partitions than the
same rectangle over hash-scattered data. 3-SF oracle parity is x23."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.layout import (
    zorder_dataframe,
    zorder_value,
)


def _morton(qs, bits):
    z = 0
    k = len(qs)
    for b in range(bits):
        for i, q in enumerate(qs):
            z |= ((q >> b) & 1) << (b * k + i)
    return z


def _quant(v, lo, hi, bits):
    if v is None:
        return 0
    levels = (1 << bits) - 1
    if hi <= lo:
        return 0
    q = math.floor((float(v) - lo) / (hi - lo) * levels)
    return max(0, min(levels, q))


def test_zorder_value_matches_model(spark):
    rows = [(1, 0, 0.0), (2, 7, 3.5), (3, 15, 10.0), (4, None, 5.0),
            (5, 3, None), (6, 99, -4.0)]  # out-of-range clamps
    df = spark.createDataFrame(rows, "id long, a long, b double")
    z = zorder_value([F.col("a"), F.col("b")], [0.0, 0.0], [15.0, 10.0], bits=4)
    got = {r["id"]: r["z"] for r in df.select("id", z.alias("z")).collect()}
    for i, a, b in rows:
        qs = [_quant(a, 0.0, 15.0, 4), _quant(b, 0.0, 10.0, 4)]
        assert got[i] == _morton(qs, 4), (i, a, b)


def test_zorder_value_validation_and_constant_col(spark):
    with pytest.raises(ValueError, match="BIGINT"):
        zorder_value([F.lit(1), F.lit(2)], [0, 0], [1, 1], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_value([], [], [])
    df = spark.createDataFrame([(1, 5)], "id long, a long")
    z = zorder_value([F.col("a")], [5.0], [5.0], bits=8)  # constant col
    assert df.select(z.alias("z")).collect()[0]["z"] == 0


def test_zorder_locality_property(spark, sf_dir):
    """A (user_id, value) rectangle over z-ordered events must land in
    a small fraction of range partitions; the same rectangle over the
    natural (time-ordered) layout touches nearly all of them."""
    from ai_etl_framework_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_parts = 16
    zed = zorder_dataframe(ev, ["user_id", "value"], num_partitions=n_parts)
    rect = (F.col("user_id") < 10) & (F.col("value") < 5)

    def touched(df):
        return (
            df.withColumn("__pid", F.spark_partition_id())
            .where(rect)
            .select("__pid")
            .distinct()
            .count()
        )

    base = ev.repartition(n_parts)  # hash-scattered baseline
    t_z, t_base = touched(zed), touched(base)
    assert t_base >= n_parts - 2  # scattered layout touches ~everything
    assert t_z <= n_parts // 2  # z-order confines the rectangle
    # layout preserves every row
    assert zed.count() == ev.count()
    # z_col exposure keeps the code as a named column
    named = zorder_dataframe(ev.limit(10), ["user_id"], z_col="zv")
    assert "zv" in named.columns
