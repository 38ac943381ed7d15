"""SQLite sink round-trip, auto-viz heuristics, insight context."""

from __future__ import annotations

import json
import os
import sqlite3

import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from ai_etl_framework_spark.ml.insights import build_insight_context, generate_insights
from ai_etl_framework_spark.ml.viz import (

    analyze_column,
    echarts_config,
    rank_charts,
    suggest_chart_type,
)
from ai_etl_framework_spark.plans.profile import profile_schema
from ai_etl_framework_spark.sinks.sqlite import read_sqlite, write_sqlite


def test_sqlite_roundtrip_with_typemap(spark, tmp_path):
    db = str(tmp_path / "out.db")
    df = spark.createDataFrame(
        [(1, "a", True, [1, 2], 1.5), (2, None, False, [], 2.5)],
        "id long, name string, flag boolean, xs array<int>, v double",
    )
    n = write_sqlite(df, db, "t", mode="overwrite")
    assert n == 2
    con = sqlite3.connect(db)
    rows = con.execute("SELECT id, name, flag, xs, v FROM t ORDER BY id").fetchall()
    con.close()
    assert rows[0][2] == 1 and rows[1][2] == 0  # BOOLEAN → INTEGER
    assert json.loads(rows[0][3]) == [1, 2]      # ARRAY → TEXT json
    # append mode adds rows
    assert write_sqlite(df, db, "t", mode="append") == 2
    back = read_sqlite(spark, db, "t")
    assert back.count() == 4


def test_sqlite_rollback_on_error(spark, tmp_path):
    db = str(tmp_path / "rb.db")
    df = spark.createDataFrame([(1,)], "id long")
    write_sqlite(df, db, "t", mode="overwrite")
    bad = spark.createDataFrame([(2,)], "id long")
    # force failure: drop the table behind the writer's back mid-write
    # is racy; instead use an invalid table name to fail fast
    with pytest.raises(sqlite3.OperationalError):
        write_sqlite(bad, db, 't"; DROP TABLE t; --', mode="append")
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 1
    con.close()


def test_viz_heuristics(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        # bucketed so the amount is NOT unique-per-row (a unique numeric
        # column is correctly ID-flagged by the cardinality rule)
        F.round(F.col("o_totalprice"), -2).alias("billed_amount"),
    )
    prof = profile_schema(orders)
    rows = prof["row_count"]

    key_role = analyze_column("o_orderkey", prof["columns"]["o_orderkey"], rows)
    assert key_role["is_id"]
    price_role = analyze_column("billed_amount", prof["columns"]["billed_amount"], rows)
    assert price_role["is_price"] and not price_role["is_id"]

    assert suggest_chart_type(prof["columns"]["o_orderpriority"]) == "pie"  # 5 distinct
    assert suggest_chart_type(
        prof["columns"]["billed_amount"], prof["columns"]["o_orderkey"]
    ) == "scatter"

    charts = rank_charts(prof)
    assert charts, "must suggest something"
    assert charts[0]["type"] == "bar"  # bar ranks first (ref :259-358)
    assert all(c["type"] in {"bar", "line", "scatter", "pie", "histogram", "box", "heatmap"}
               for c in charts)
    # ID columns never appear as metrics
    for c in charts:
        assert c.get("y") != "o_orderkey"


def test_echarts_config_shapes():
    pie = echarts_config(
        {"type": "pie", "x": "seg"},
        [{"seg": "A", "count": 3}, {"seg": "B", "count": 1}],
    )
    assert pie["series"][0]["type"] == "pie"
    assert pie["series"][0]["data"][0] == {"name": "A", "value": 3}

    bar = echarts_config(
        {"type": "bar", "x": "k", "y": "v"}, [{"k": "x", "v": 10}, {"k": "y", "v": 20}]
    )
    assert bar["xAxis"]["data"] == ["x", "y"]
    assert bar["series"][0]["data"] == [10, 20]


def test_insight_context_offline(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(200)
    out = generate_insights(orders)  # no client → context only
    assert out["summary"] is None
    ctx = out["context"]
    assert ctx["row_count"] == 200
    assert len(ctx["sample_rows"]) == 5
    assert "o_totalprice" in ctx["columns"]
    # no full value lists leak into the LLM payload
    assert all("values" not in c for c in ctx["columns"].values())


def test_chart_records_every_type(spark):
    """chart_records dispatches every rank_charts spec type to the
    distributed viz_prep aggregates (r12 entry-point-C parity)."""
    from ai_etl_framework_spark.ml.viz import chart_records

    df = spark.createDataFrame(
        [
            (1, "a", "x", 10.0, 1.0, "2024-01-01"),
            (2, "b", "y", 20.0, 2.0, "2024-01-01"),
            (3, "a", "x", 30.0, 3.0, "2024-01-02"),
            (4, "b", "y", 40.0, 4.0, "2024-01-02"),
            (5, "a", "x", 50.0, 5.0, "2024-01-03"),
        ],
        "id long, grp string, sub string, amount double, qty double, d string",
    )
    bar = chart_records(df, {"type": "bar", "x": "grp", "y": "amount", "top_n": 15})
    assert {r["grp"]: r["amount"] for r in bar} == {"a": 90.0, "b": 60.0}

    line = chart_records(df, {"type": "line", "x": "d", "y": "amount"})
    assert [r["amount"] for r in line] == [30.0, 70.0, 50.0]

    multi = chart_records(df, {"type": "line", "x": "d", "y_fields": ["amount", "qty"]})
    assert multi[0]["amount"] == 30.0 and multi[0]["qty"] == 3.0

    pie = chart_records(df, {"type": "pie", "x": "grp"})
    assert {r["grp"]: r["count"] for r in pie} == {"a": 3, "b": 2}

    hist = chart_records(df, {"type": "histogram", "x": "amount", "bins": 4})
    assert sum(r["count"] for r in hist) == 5
    assert all(set(r) == {"amount", "count"} for r in hist)

    scat = chart_records(df, {"type": "scatter", "x": "amount", "y": "qty"})
    assert len(scat) == 5

    box = chart_records(df, {"type": "box", "x": "grp", "y": "amount"})
    by = {r["grp"]: r["amount"] for r in box}
    assert by["a"][0] == 10.0 and by["a"][-1] == 50.0 and len(by["a"]) == 5

    heat = chart_records(df, {"type": "heatmap", "x": "grp", "y": "sub", "z": "amount"})
    assert {(r["grp"], r["sub"]): r["amount"] for r in heat} == {
        ("a", "x"): 90.0,
        ("b", "y"): 60.0,
    }

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chart_records(df, {"type": "nope", "x": "grp"})


def test_generate_all_charts_isolation(spark):
    """One failing chart rides along as an error item; the rest of the
    batch still generates (ref visualization_generator :56-60)."""
    from ai_etl_framework_spark.ml.viz import generate_all_charts

    df = spark.createDataFrame(
        [(1, "a", 10.0, 5.0), (2, "b", 20.0, 6.0), (3, "a", 30.0, 7.0)],
        "id long, grp string, amount double, qty double",
    )
    charts = generate_all_charts(df, max_charts=8)
    ok = [c for c in charts if "config" in c]
    assert len(ok) >= 2
    for c in ok:
        assert "series" in c["config"] and c["rows"] >= 1
    # a spec referencing a missing column fails alone, not the batch
    from ai_etl_framework_spark.plans.profile import profile_schema

    prof = profile_schema(df)
    prof["columns"]["ghost"] = {"type": "categorical", "distinct_count": 3}
    charts2 = generate_all_charts(df, max_charts=8, profile=prof)
    assert any("error" in c for c in charts2)
    assert any("config" in c for c in charts2)


# -- NL prompt → chart (reference generate_custom_chart, r13) ----------


def test_parse_chart_prompt_keyword_decisions():
    """Chart-type keyword table + elif ORDER ported verbatim from
    visualization_generator.py:552-568 — 'distribution' belongs to
    pie (checked before histogram), line outranks everything."""
    from ai_etl_framework_spark.ml.viz import parse_chart_prompt

    cols = ["region", "total_amount"]
    pick = lambda p: parse_chart_prompt(p, cols)["chart_type"]
    assert pick("bar chart of sales") == "bar"           # default
    assert pick("some numbers please") == "bar"          # no keyword → bar
    assert pick("trend of revenue") == "line"
    assert pick("sales over time") == "line"
    assert pick("distribution of regions") == "pie"      # pie wins, not histogram
    assert pick("breakdown by region") == "pie"
    assert pick("amount vs quantity") == "scatter"
    assert pick("correlation of price and qty") == "scatter"
    assert pick("histogram of amounts") == "histogram"
    assert pick("boxplot of amount by region") == "box"
    assert pick("heat map of sales") == "heatmap"
    # 'line' beats 'pie' because the line family is checked first
    assert pick("pie timeline") == "line"


def test_parse_chart_prompt_column_matching_and_title():
    """Column mentions: lowercase substring OR underscores-as-spaces,
    collected in frame column order (ref :570-576); title truncates
    at 50 chars with '...' (ref :592-598)."""
    from ai_etl_framework_spark.ml.viz import parse_chart_prompt

    cols = ["order_id", "region", "total_amount", "qty"]
    out = parse_chart_prompt("bar of total amount by region", cols)
    # frame order: region precedes total_amount in the prompt but
    # NOT in the frame — the reference iterates frame columns
    assert out["x_column"] == "region"
    assert out["y_column"] == "total_amount"

    # no column mentioned, no profile → x falls back to columns[0]
    out2 = parse_chart_prompt("just a chart", cols)
    assert out2["x_column"] == "order_id" and out2["y_column"] is None

    long_prompt = "x" * 60
    assert parse_chart_prompt(long_prompt, cols)["title"] == "x" * 50 + "..."
    assert parse_chart_prompt("short", cols)["title"] == "short"


def test_parse_chart_prompt_profile_fallback(spark):
    """No column mentioned + profile → role-driven pick: bar/pie get
    first non-ID categorical + first non-ID numeric, line/histogram
    get the first non-ID numeric, scatter gets nothing (ref
    :578-590)."""
    from ai_etl_framework_spark.ml.viz import parse_chart_prompt
    from ai_etl_framework_spark.plans.profile import profile_schema

    df = spark.createDataFrame(
        [(1, "a", 10.0, 1.5), (2, "b", 20.0, 2.5), (3, "a", 30.0, 3.5)],
        "order_id long, grp string, amount double, qty double",
    )
    prof = profile_schema(df)
    cols = df.columns

    bar = parse_chart_prompt("show me a chart", cols, profile=prof)
    assert bar["x_column"] == "grp" and bar["y_column"] == "amount"

    pie = parse_chart_prompt("a breakdown", cols, profile=prof)
    assert pie["x_column"] == "grp" and pie["y_column"] == "amount"

    line = parse_chart_prompt("a trend", cols, profile=prof)
    assert line["x_column"] == "amount" and line["y_column"] is None

    # scatter has NO fallback: x degrades to the frame's first column
    scat = parse_chart_prompt("a correlation", cols, profile=prof)
    assert scat["chart_type"] == "scatter"
    assert scat["x_column"] == "order_id" and scat["y_column"] is None


def test_custom_chart_execution_and_none_paths(spark):
    """custom_chart rides the distributed chart-prep aggregates and
    returns None exactly where the reference path dies (ref
    :376-465: bar/line with no y, heatmap with no z)."""
    from ai_etl_framework_spark.ml.viz import custom_chart

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "order_id long, region string, total_amount double",
    )
    out = custom_chart(df, "bar of total amount by region")
    assert out is not None and out["chart_type"] == "bar"
    assert out["x_column"] == "region" and out["y_column"] == "total_amount"
    assert out["title"] == "bar of total amount by region"
    series = out["chart_config"]["series"][0]["data"]
    assert sorted(series, reverse=True) == [40.0, 20.0]  # sum per region, desc

    # pie needs only x — executes off the count-per-category prep
    pie = custom_chart(df, "breakdown by region")
    assert pie is not None and pie["chart_type"] == "pie"

    # bar with a prompt that names no numeric → fallback fills y from
    # the profile, still renders
    auto = custom_chart(df, "chart it")
    assert auto is not None and auto["chart_type"] == "bar"

    # heatmap: custom path never parses z → None (ref pivot_table(None))
    assert custom_chart(df, "heat map of region") is None

    # bar where even the fallback can't find a y (all-categorical frame)
    cat_only = spark.createDataFrame([("a", "x"), ("b", "y")], "g string, h string")
    assert custom_chart(cat_only, "bar of g") is None


def test_custom_chart_edge_frames(spark):
    """Edge frames for the NL prompt path: a numeric-only frame has no
    categorical fallback for bar (x degrades to the first column and
    the bar prep fails on a non-groupable unique id → None via the
    per-chart isolation), while histogram still renders off the first
    non-ID numeric; an empty-prompt-vocabulary frame (no column
    mentioned, profile roles all ID) falls back to columns[0]."""
    from ai_etl_framework_spark.ml.viz import custom_chart, parse_chart_prompt

    nums = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "order_id long, amount double"
    )
    hist = custom_chart(nums, "histogram of amount")
    assert hist is not None and hist["chart_type"] == "histogram"
    assert hist["x_column"] == "amount"

    # scatter prompt naming both numerics: x/y in frame order
    sc = custom_chart(nums, "order id vs amount")
    assert sc is not None and sc["chart_type"] == "scatter"
    assert sc["x_column"] == "order_id" and sc["y_column"] == "amount"

    # all-ID columns: fallback roles exclude them -> x = columns[0]
    ids = spark.createDataFrame([(1, 2)], "order_id long, user_id long")
    cfg = parse_chart_prompt("bar chart please", ids.columns)
    assert cfg["x_column"] == "order_id" and cfg["y_column"] is None
