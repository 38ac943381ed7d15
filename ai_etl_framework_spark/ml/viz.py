"""Auto-visualization: column analysis heuristics → ranked chart
suggestions → chart-config dicts.

Reference:
- src/api/visualization_generator.py:76-358 — column analysis
  (ID / boolean-like / rate / unit-price / code / year-month /
  index / geographic detection at :128-216) and chart ranking
  (bar > line > scatter > pie > histogram > box > heatmap, :259-358).
- src/api/echarts_generator.py:446-556 — chart-type suggestion by
  dtype/cardinality (datetime→line, 2-6 distinct→pie, ≤20
  distinct→bar, numeric×numeric→scatter) and config building.

The analysis consumes `plans.profile.profile_schema` output (one
distributed aggregate pass); everything in this module is driver-side
logic over that small profile — no Spark work.
"""

from __future__ import annotations

from typing import Any, Optional

# name-substring heuristics (ref visualization_generator.py:128-216)
ID_PARTS = ("_id", "id_", "uuid", "guid", "key")
ID_EXACT = {"id", "pk", "index"}
RATE_PARTS = ("rate", "ratio", "pct", "percent", "share")
PRICE_PARTS = ("price", "cost", "amount", "billed", "charge", "payment")
CODE_PARTS = ("code", "icd", "sku", "zip", "postal")
GEO_PARTS = ("lat", "lon", "lng", "latitude", "longitude", "country", "state", "city", "region")
YEAR_MONTH_PARTS = ("year", "month", "quarter", "week")


def analyze_column(name: str, info: dict[str, Any], rows: int) -> dict[str, Any]:
    """Role classification for one profiled column."""
    low = name.lower()
    bucket = info["type"]
    distinct = info.get("distinct_count")
    role = {
        "name": name,
        "bucket": bucket,
        "is_id": low in ID_EXACT
        or any(p in low for p in ID_PARTS)
        or (distinct is not None and distinct == rows and rows > 100),
        "is_rate": any(p in low for p in RATE_PARTS),
        "is_price": any(p in low for p in PRICE_PARTS),
        "is_code": any(p in low for p in CODE_PARTS),
        "is_geo": any(p in low for p in GEO_PARTS),
        "is_year_month": any(p in low for p in YEAR_MONTH_PARTS),
        "is_boolean_like": bucket == "boolean"
        or (bucket == "numeric" and distinct == 2),
    }
    return role


def suggest_chart_type(
    x_info: dict[str, Any], y_info: Optional[dict[str, Any]] = None
) -> str:
    """dtype/cardinality suggestion, reference rule ORDER preserved
    (echarts_generator.py:446-485): temporal → line; 2-6 distinct →
    pie; ≤20 → bar; numeric×numeric → scatter; then the
    profile-driven refinement (high-cardinality single column →
    histogram) the reference defaults to bar."""
    if x_info["type"] == "datetime":
        return "line"
    n = x_info.get("distinct_count") or 0
    if 2 <= n <= 6:
        return "pie"
    if n <= 20:
        return "bar"
    if y_info and x_info["type"] == "numeric" and y_info["type"] == "numeric":
        return "scatter"
    if x_info["type"] in ("numeric", "categorical"):
        return "histogram"
    return "bar"


def rank_charts(profile: dict[str, Any], max_charts: int = 8) -> list[dict[str, Any]]:
    """Ranked chart configs from a schema profile (ref :259-358 —
    priority bar > line > scatter > pie > histogram > box > heatmap)."""
    rows = profile["row_count"]
    cols = profile["columns"]
    roles = {n: analyze_column(n, i, rows) for n, i in cols.items()}
    dims = [
        n
        for n, i in cols.items()
        if i["type"] == "categorical"
        and not roles[n]["is_id"]
        and (i.get("distinct_count") or 0) <= 20
    ]
    dates = [n for n, i in cols.items() if i["type"] == "datetime"]
    metrics = [
        n
        for n, i in cols.items()
        if i["type"] == "numeric" and not roles[n]["is_id"] and not roles[n]["is_boolean_like"]
    ]

    charts: list[dict[str, Any]] = []
    for d in dims[:2]:
        for m in metrics[:2]:
            charts.append({"type": "bar", "x": d, "y": m, "agg": "sum", "top_n": 15})
    for t in dates[:1]:
        for m in metrics[:2]:
            charts.append({"type": "line", "x": t, "y": m, "agg": "sum"})
        if len(metrics) >= 2:
            # one multi-series trend (ref generate_multi_series_config)
            charts.append(
                {"type": "line", "x": t, "y_fields": metrics[:3], "agg": "sum"}
            )
    if len(metrics) >= 2:
        charts.append({"type": "scatter", "x": metrics[0], "y": metrics[1], "sample": 1000})
    for d in dims:
        n = cols[d].get("distinct_count") or 0
        if 2 <= n <= 6:
            charts.append({"type": "pie", "x": d, "top_n": 10})
            break
    for m in metrics[:2]:
        charts.append({"type": "histogram", "x": m, "bins": 30})
    if dims and metrics:
        charts.append({"type": "box", "x": dims[0], "y": metrics[0]})
    if len(dims) >= 2 and metrics:
        charts.append({"type": "heatmap", "x": dims[0], "y": dims[1], "z": metrics[0]})
    return charts[:max_charts]


def echarts_config(chart: dict[str, Any], records: list[dict[str, Any]]) -> dict[str, Any]:
    """ECharts option dict from a rank_charts spec + query result
    records. Full-parity builders live in ml.echarts
    (ref echarts_generator.py:14-24 chart types); this adapter maps
    the spec vocabulary (histogram→bar over bin counts, box→boxplot)
    onto them."""
    from ai_etl_framework_spark.ml.echarts import (
        generate_echarts_config,
        generate_multi_series_config,
    )

    ctype = chart["type"]
    x = chart.get("x")
    if chart.get("y_fields"):
        return generate_multi_series_config(records, x, chart["y_fields"], ctype)
    y = chart.get("y") or ("count" if ctype in ("histogram", "pie") else None)
    if ctype == "pie":
        # rank_charts pies are count-per-category; tolerate either key
        recs = [
            {x: r[x], "value": r.get("count", r.get(chart.get("y", ""), 0))}
            for r in records
        ]
        return generate_echarts_config(recs, "pie", x, "value")
    if ctype == "heatmap":
        return generate_echarts_config(
            records, "heatmap", x, chart["y"], value_field=chart.get("z", "value")
        )
    if ctype == "box":
        # no reference builder for boxplot — keep the minimal shape
        return {
            "xAxis": {"type": "category", "data": [str(r[x]) for r in records]},
            "yAxis": {"type": "value"},
            "series": [{"type": "boxplot", "data": [r.get(chart["y"]) for r in records]}],
        }
    kind = "bar" if ctype == "histogram" else ctype
    return generate_echarts_config(records, kind, x, y)
