"""Interval join (streaming/joins.py): pinned batch semantics
(bounds inclusive, key equality, outer rows, self-join column
prefixing), the equi-join plan pin (never a cartesian), and REAL
stream-stream execution — two file-source streams, watermarks, inner
join, AvailableNow — verified row-identical to the batch twin, plus
an incremental second micro-batch. The 3-SF oracle row is x19."""

from __future__ import annotations

import datetime as dt

import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from ai_etl_framework_spark.streaming.joins import interval_join


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    views = spark.createDataFrame(
        [
            (1, 10, _ts(0)),
            (2, 10, _ts(30)),
            (3, 20, _ts(0)),
            (4, 30, _ts(0)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    clicks = spark.createDataFrame(
        [
            (101, 10, _ts(5)),     # matches view 1 (inside)
            (102, 10, _ts(10)),    # matches views 1 (boundary: == upper)
            (103, 10, _ts(29)),    # matches neither 1 (19>10) nor 2 (before)
            (104, 10, _ts(40)),    # matches view 2 (boundary: == upper)
            (105, 20, _ts(11)),    # just outside view 3's window
            (106, 99, _ts(1)),     # no such user on the left
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return views, clicks


def test_batch_semantics_pinned(sides):
    views, clicks = sides
    out = interval_join(views, clicks, key="user_id", upper="10 minutes")
    got = sorted(
        (r["left_event_id"], r["right_event_id"]) for r in out.collect()
    )
    assert got == [(1, 101), (1, 102), (2, 104)]
    assert out.columns == [
        "user_id", "left_event_id", "left_ts", "right_event_id", "right_ts",
    ]


def test_left_outer_and_lower_bound(sides):
    views, clicks = sides
    out = interval_join(
        views, clicks, key="user_id", lower="6 minutes",
        upper="10 minutes", how="left_outer",
    )
    got = sorted(
        (r["left_event_id"], r["right_event_id"]) for r in out.collect()
    )
    # lower=6 excludes click 101 (at +5); 104 (at v2+10) stays inside
    # [36, 40]; unmatched views survive as NULL rows
    assert got == [(1, 102), (2, 104), (3, None), (4, None)]
    with pytest.raises(ValueError, match="inner"):
        interval_join(views, clicks, how="full_outer")


def test_plan_is_equi_join_not_cartesian(sides):
    views, clicks = sides
    plan = (
        interval_join(views, clicks, key="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_stream_join_matches_batch(spark, tmp_path):
    from ai_etl_framework_spark.session import load_table
    from ai_etl_framework_spark.streaming.events import read_stream, start_to_parquet

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views = events.where(F.col("event_type") == "view").drop("event_type")
    clicks = events.where(F.col("event_type") == "click").drop("event_type")

    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        vs = read_stream(spark, vdir, fmt="parquet", schema=views.schema)
        cs = read_stream(spark, cdir, fmt="parquet", schema=clicks.schema)
        j = interval_join(
            vs, cs, key="user_id", upper="12 hours", watermark="1 day"
        )
        q = start_to_parquet(j, out, ckpt, available_now=True)
        q.awaitTermination(180)
        assert not q.isActive

    # split by TIME (in-order arrival, like a real stream): replaying
    # a whole time-range slice as "late" data would rightly be dropped
    # past the watermark — that's streaming semantics, not a bug
    cut = events.agg(
        F.percentile_approx("ts", 0.5, 10000).alias("m")
    ).collect()[0]["m"]

    views.where(F.col("ts") <= cut).write.mode("overwrite").parquet(vdir)
    clicks.where(F.col("ts") <= cut).write.mode("overwrite").parquet(cdir)
    run()

    def batch_twin(v, c):
        return sorted(
            (r["left_event_id"], r["right_event_id"])
            for r in interval_join(v, c, key="user_id", upper="12 hours").collect()
        )

    got1 = sorted(
        (r["left_event_id"], r["right_event_id"])
        for r in spark.read.parquet(out).collect()
    )
    exp1 = batch_twin(
        views.where(F.col("ts") <= cut), clicks.where(F.col("ts") <= cut)
    )
    assert got1 == exp1 and len(got1) > 0

    # incremental second micro-batch: the later half arrives; joined
    # state must still match batch-1 views to boundary-crossing clicks
    # (watermark 1 day > the 12 h interval keeps them in state)
    views.where(F.col("ts") > cut).write.mode("append").parquet(vdir)
    clicks.where(F.col("ts") > cut).write.mode("append").parquet(cdir)
    run()
    got2 = sorted(
        (r["left_event_id"], r["right_event_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert got2 == batch_twin(views, clicks)
    # the split actually produced cross-batch matches (non-vacuous)
    assert len(got2) > len(exp1)


def test_stream_stream_left_outer_emits_nulls_at_watermark(spark, tmp_path):
    """left_outer stream-stream: unmatched left rows surface as NULL
    rows only once the watermark passes their join window — i.e. on a
    LATER run whose new data advances the watermark. Final output
    equals the batch left-outer twin."""
    import datetime as dt

    from ai_etl_framework_spark.streaming.events import read_stream, start_to_parquet

    schema = "event_id long, user_id long, ts timestamp"
    views = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 20, _ts(1))], schema
    )
    clicks1 = spark.createDataFrame([(101, 10, _ts(5))], schema)
    # far-future rows on BOTH sides: the global watermark is the MIN
    # across all watermarked inputs, so a side that receives no new
    # data pins it — both must advance for eviction
    clicks2 = spark.createDataFrame(
        [(102, 99, _ts(60 * 24 * 10))], schema
    )
    views2 = spark.createDataFrame(
        [(3, 97, _ts(60 * 24 * 10))], schema
    )
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "k")

    def run():
        vs = read_stream(spark, vdir, fmt="parquet", schema=views.schema)
        cs = read_stream(spark, cdir, fmt="parquet", schema=views.schema)
        j = interval_join(
            vs, cs, key="user_id", upper="10 minutes",
            watermark="30 minutes", how="left_outer",
        )
        q = start_to_parquet(j, out, ckpt, available_now=True)
        q.awaitTermination(180)

    views.write.mode("overwrite").parquet(vdir)
    clicks1.write.mode("overwrite").parquet(cdir)
    run()
    got1 = sorted(
        (r["left_event_id"], r["right_event_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert got1 == [(1, 101)]  # inner match emits; NULL row held back

    # run 2 advances the watermark (committed at batch end); the NULL
    # eviction happens in the FOLLOWING batch, so a third run with one
    # more far-future row triggers it
    clicks2.write.mode("append").parquet(cdir)
    views2.write.mode("append").parquet(vdir)
    run()
    clicks3 = spark.createDataFrame(
        [(103, 98, _ts(60 * 24 * 20))], views.schema
    )
    views3 = spark.createDataFrame(
        [(4, 96, _ts(60 * 24 * 20))], views.schema
    )
    clicks3.write.mode("append").parquet(cdir)
    views3.write.mode("append").parquet(vdir)
    run()
    got2 = sorted(
        (r["left_event_id"], r["right_event_id"])
        for r in spark.read.parquet(out).collect()
    )
    # view 1 matched; views 2 and 3 evicted unmatched once the
    # watermark passed their windows; view 4 (newest) stays in state
    assert got2 == [(1, 101), (2, None), (3, None)]
