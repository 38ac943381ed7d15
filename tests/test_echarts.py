"""Golden-config tests for the full ECharts surface (ml.echarts),
mirroring the reference's src/api/echarts_generator.py behavior:
9 chart types (sunburst falls back to bar), suggestion decision
table, multi-series, interactive decoration, and — stricter than the
reference — JSON-serializability of every emitted config."""

from __future__ import annotations

import json

import pytest

from ai_etl_framework_spark.ml.echarts import (
    CHART_TYPES,
    add_interactive_features,
    generate_echarts_config,
    generate_multi_series_config,
    suggest_chart_type,
)

DATA = [
    {"cat": "a", "val": 3, "size": 10, "other": 1.5},
    {"cat": "b", "val": 7, "size": 30, "other": 2.5},
    {"cat": "c", "val": 5, "size": 20, "other": 0.5},
]


def _gen(ctype, **kw):
    return generate_echarts_config(DATA, ctype, "cat", "val", **kw)


def test_every_declared_type_builds_and_is_json_safe():
    assert len(CHART_TYPES) == 9
    for ctype in CHART_TYPES:
        cfg = _gen(ctype, title="t")
        json.dumps(cfg)  # reference embeds lambdas; we must not
        assert cfg["series"], ctype


def test_bar_golden():
    cfg = _gen("bar", title="Bar")
    assert cfg["title"] == {"text": "Bar", "left": "center"}
    assert cfg["xAxis"] == {"type": "category", "data": ["a", "b", "c"]}
    assert cfg["yAxis"] == {"type": "value"}
    s = cfg["series"][0]
    assert s["type"] == "bar" and s["data"] == [3, 7, 5]
    assert s["itemStyle"]["borderRadius"] == [4, 4, 0, 0]
    assert cfg["tooltip"]["axisPointer"] == {"type": "shadow"}
    # horizontal flips axes + radius; stacked adds a stack group
    h = _gen("bar", horizontal=True)
    assert h["yAxis"]["type"] == "category" and h["xAxis"]["type"] == "value"
    assert h["series"][0]["itemStyle"]["borderRadius"] == [0, 4, 4, 0]
    assert _gen("bar", stacked=True)["series"][0]["stack"] == "total"
    # no title → no title key, tighter grid top
    nt = _gen("bar")
    assert "title" not in nt and nt["grid"]["top"] == "8%"


def test_line_and_area_golden():
    line = _gen("line")
    s = line["series"][0]
    assert s["smooth"] is True and s["symbol"] == "circle" and "areaStyle" not in s
    assert line["xAxis"]["boundaryGap"] is False
    area = _gen("area")
    assert area["series"][0]["areaStyle"] == {"opacity": 0.3}
    assert _gen("line", smooth=False)["series"][0]["smooth"] is False


def test_pie_golden():
    cfg = _gen("pie")
    s = cfg["series"][0]
    assert s["data"] == [
        {"name": "a", "value": 3}, {"name": "b", "value": 7}, {"name": "c", "value": 5},
    ]
    assert s["radius"] == "70%"
    assert _gen("pie", donut=True)["series"][0]["radius"] == ["40%", "70%"]
    assert cfg["tooltip"]["formatter"] == "{b}: {c} ({d}%)"
    assert cfg["legend"] == {"orient": "horizontal", "bottom": "5%"}


def test_scatter_golden_and_sized_points():
    cfg = generate_echarts_config(DATA, "scatter", "size", "other")
    s = cfg["series"][0]
    assert s["data"] == [[10, 1.5], [30, 2.5], [20, 0.5]]
    assert s["symbolSize"] == 12
    assert cfg["xAxis"] == {"type": "value", "name": "size"}
    sized = generate_echarts_config(DATA, "scatter", "size", "other", size_field="size")
    pts = sized["series"][0]["data"]
    # max size point → (30/30)*40+5 = 45; all JSON scalars, no lambdas
    assert pts[1] == {"value": [30, 2.5], "symbolSize": 45.0}
    assert pts[0]["symbolSize"] == pytest.approx(10 / 30 * 40 + 5)


def test_treemap_golden():
    cfg = _gen("treemap")
    s = cfg["series"][0]
    assert s["type"] == "treemap" and s["leafDepth"] == 1
    assert s["data"][1] == {"name": "b", "value": 7}
    assert s["upperLabel"] == {"show": True, "height": 30}


def test_heatmap_golden():
    data = [
        {"x": "m", "y": "p", "value": 1},
        {"x": "n", "y": "p", "value": 9},
        {"x": "m", "y": "q", "value": 4},
    ]
    cfg = generate_echarts_config(data, "heatmap", "x", "y")
    assert cfg["xAxis"]["data"] == ["m", "n"] and cfg["yAxis"]["data"] == ["p", "q"]
    assert cfg["series"][0]["data"] == [[0, 0, 1], [1, 0, 9], [0, 1, 4]]
    assert cfg["visualMap"]["min"] == 1 and cfg["visualMap"]["max"] == 9


def test_gauge_golden():
    cfg = generate_echarts_config(
        [{"score": 72.5}], "gauge", "score", "score", title="Quality", max_value=100
    )
    s = cfg["series"][0]
    assert s["type"] == "gauge" and s["max"] == 100
    assert s["data"] == [{"value": 72.5, "name": "Quality"}]
    assert generate_echarts_config([], "gauge", "score", "score")["series"][0]["data"][0]["value"] == 0


def test_sunburst_and_unknown_fall_back_to_bar():
    # reference dispatch (:50-61) has no sunburst builder → bar
    assert generate_echarts_config(DATA, "sunburst", "cat", "val")["series"][0]["type"] == "bar"
    assert generate_echarts_config(DATA, "nonsense", "cat", "val")["series"][0]["type"] == "bar"


def test_multi_series_golden():
    cfg = generate_multi_series_config(DATA, "cat", ["val", "size"], chart_type="line")
    assert [s["name"] for s in cfg["series"]] == ["val", "size"]
    assert cfg["series"][1]["data"] == [10, 30, 20]
    assert all(s["smooth"] for s in cfg["series"])
    assert cfg["legend"]["data"] == ["val", "size"]
    assert cfg["xAxis"]["boundaryGap"] is False
    assert cfg["tooltip"]["axisPointer"]["type"] == "line"
    bar = generate_multi_series_config(DATA, "cat", ["val"], chart_type="bar")
    assert bar["xAxis"]["boundaryGap"] is True
    assert bar["tooltip"]["axisPointer"]["type"] == "shadow"
    assert bar["series"][0]["itemStyle"] == {"borderRadius": [4, 4, 0, 0]}
    json.dumps(cfg), json.dumps(bar)


def test_interactive_features():
    cfg = _gen("bar", title="t")
    out = add_interactive_features(cfg, enable_zoom=True, enable_brush=True)
    assert set(out["toolbox"]["feature"]) == {"saveAsImage", "dataView", "restore", "brush"}
    assert out["dataZoom"][0]["type"] == "inside" and out["dataZoom"][1]["type"] == "slider"
    assert out["grid"]["bottom"] == "15%"  # room for the slider
    assert out["brush"]["brushLink"] == "all"
    json.dumps(out)
    bare = add_interactive_features(_gen("pie"), enable_toolbox=False)
    assert "toolbox" not in bare and "dataZoom" not in bare


def test_suggest_chart_type_decision_table(spark):
    from pyspark.sql import functions as F

    # temporal x wins regardless of cardinality
    dated = spark.range(40).select(
        F.expr("date_add(date'2024-01-01', cast(id as int))").alias("d"),
        F.col("id").alias("v"),
    )
    assert suggest_chart_type(dated, "d", "v") == "line"
    # 2-6 distinct → pie (rule fires before numeric→scatter, as in ref)
    few = spark.range(100).select((F.col("id") % 4).alias("g"), F.col("id").alias("v"))
    assert suggest_chart_type(few, "g", "v") == "pie"
    # 7-20 distinct → bar
    mid = spark.range(100).select((F.col("id") % 15).alias("g"), F.col("id").alias("v"))
    assert suggest_chart_type(mid, "g", "v") == "bar"
    # high-cardinality numeric × numeric → scatter
    many = spark.range(500).select(F.col("id").alias("x"), (F.col("id") * 2).alias("y"))
    assert suggest_chart_type(many, "x", "y") == "scatter"
    # high-cardinality strings → bar; unknown column → bar
    strs = spark.range(500).select(
        F.concat(F.lit("u"), F.col("id")).alias("s"), F.col("id").alias("v")
    )
    assert suggest_chart_type(strs, "s", "v") == "bar"
    assert suggest_chart_type(strs, "missing", "v") == "bar"


def test_viz_adapter_routes_through_full_builders():
    from ai_etl_framework_spark.ml.viz import echarts_config

    bar = echarts_config(
        {"type": "bar", "x": "cat", "y": "val"}, DATA
    )
    assert bar["series"][0]["itemStyle"]["borderRadius"] == [4, 4, 0, 0]
    hist = echarts_config(
        {"type": "histogram", "x": "cat"}, [{"cat": "0-10", "count": 4}]
    )
    assert hist["series"][0]["type"] == "bar" and hist["series"][0]["data"] == [4]
    pie = echarts_config({"type": "pie", "x": "cat"}, [{"cat": "a", "count": 2}])
    assert pie["series"][0]["data"] == [{"name": "a", "value": 2}]
    heat = echarts_config(
        {"type": "heatmap", "x": "x", "y": "y", "z": "value"},
        [{"x": "m", "y": "p", "value": 3}],
    )
    assert heat["series"][0]["type"] == "heatmap"
    box = echarts_config(
        {"type": "box", "x": "g", "y": "stats"},
        [{"g": "a", "stats": [1, 2, 3, 4, 5]}],
    )
    assert box["series"][0]["type"] == "boxplot"


def test_rank_charts_proposes_multi_series_and_adapter_routes_it():
    from ai_etl_framework_spark.ml.viz import echarts_config, rank_charts

    prof = {
        "row_count": 1000,
        "columns": {
            "day": {"type": "datetime", "distinct_count": 300},
            "revenue": {"type": "numeric", "distinct_count": 900},
            "cost": {"type": "numeric", "distinct_count": 880},
            "regioncat": {"type": "categorical", "distinct_count": 4},
        },
    }
    charts = rank_charts(prof, max_charts=12)
    multi = [c for c in charts if c.get("y_fields")]
    assert multi and multi[0]["y_fields"] == ["revenue", "cost"]
    cfg = echarts_config(
        multi[0],
        [{"day": "2024-01-01", "revenue": 5, "cost": 2},
         {"day": "2024-01-02", "revenue": 7, "cost": 3}],
    )
    assert [s["name"] for s in cfg["series"]] == ["revenue", "cost"]
    assert cfg["series"][1]["data"] == [2, 3]


def test_scatter_and_heatmap_tolerate_null_values():
    """r4 review: SQL NULLs in size/z columns crashed max()/division
    with TypeError; they default like missing keys now."""
    from ai_etl_framework_spark.ml.echarts import generate_echarts_config

    scatter = generate_echarts_config(
        [{"x": 1, "y": 2, "sz": 5}, {"x": 2, "y": 3, "sz": None}],
        "scatter", "x", "y", size_field="sz",
    )
    assert len(scatter["series"][0]["data"]) == 2

    heat = generate_echarts_config(
        [{"a": "r1", "b": "c1", "value": 7},
         {"a": "r2", "b": "c2", "value": None}],
        "heatmap", "a", "b",
    )
    assert heat["visualMap"]["min"] == 0 and heat["visualMap"]["max"] == 7


def test_scatter_tooltip_decomposes_value_pair():
    from ai_etl_framework_spark.ml.echarts import generate_echarts_config

    cfg = generate_echarts_config([{"x": 1, "y": 2}], "scatter", "x", "y")
    # {@[0]}/{@[1]} index into the [x, y] pair; {c0}/{c1} would both
    # render the joined string under an item trigger
    assert "{@[0]}" in cfg["tooltip"]["formatter"]
    assert "{@[1]}" in cfg["tooltip"]["formatter"]
