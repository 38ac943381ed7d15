"""Bucketed co-located joins (no exchange) and the staged pipeline
mode (extract / transform / load across process-style boundaries)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators import NullRemover
from ai_etl_framework_spark.pipeline.pipeline import Pipeline
from ai_etl_framework_spark.sinks.writers import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The 100 TB co-location story: both sides bucketed on the join
    key ⇒ the join plan contains NO shuffle exchange."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"], num_buckets=8
    )
    try:
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        # force sort-merge so only bucketing can remove the exchange
        joined_smj = a.hint("merge").join(b, a.o_orderkey == b.l_orderkey)
        plan = joined_smj._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        # and it is still correct
        expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_staged_pipeline_resume(spark, sf_dir, tmp_path):
    """run_extract_only → run_transform_only → run_load_only with
    parquet checkpoints between stages (the reference's staged REST
    mode, pipeline.py:345-475)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "gold")

    p1 = Pipeline(pipeline_id="staged", checkpoint_dir=ckpt).extract(orders)
    extracted_path = p1.run_extract_only()
    assert spark.read.parquet(extracted_path).count() == orders.count()

    # a "new process": a fresh Pipeline object resumes from checkpoints
    p2 = Pipeline(pipeline_id="staged", checkpoint_dir=ckpt).extract(orders)
    p2.transform(NullRemover(strategy="drop", fields=["o_orderstatus"]))
    transformed_path = p2.run_transform_only()
    n_transformed = spark.read.parquet(transformed_path).count()
    assert 0 < n_transformed <= orders.count()

    p3 = Pipeline(pipeline_id="staged", checkpoint_dir=ckpt).extract(orders)
    p3.load(lambda df: df.write.mode("overwrite").parquet(out))
    result = p3.run_load_only()
    assert result.success
    assert result.records_loaded == n_transformed
    assert spark.read.parquet(out).count() == n_transformed
