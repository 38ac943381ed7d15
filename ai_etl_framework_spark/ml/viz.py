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


def chart_records(df, chart: dict[str, Any], max_rows: int = 1000) -> list[dict[str, Any]]:
    """Execute one rank_charts spec as a DISTRIBUTED chart-prep
    aggregate and return bounded records for the config builders —
    the Spark analog of visualization_generator.py's driver-side
    pandas groupbys (ref :360-450). Every branch dispatches to
    operators/viz_prep (the q29-oracle-checked aggregates), so the
    collect() only ever sees an aggregated / top-n / sampled frame:
    bar top-n, pie top-n, date-grain line, fixed-bin histogram,
    bounded scatter sample, per-category box summary, (x, y)-cell
    heatmap — never the raw table."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators import viz_prep as vp

    ctype = chart["type"]
    x = chart.get("x")
    if chart.get("y_fields"):
        # multi-series trend: ONE date-grain aggregation carrying all
        # series (ref generate_multi_series_config input shape)
        out = (
            df.withColumn("__d", F.to_date(F.col(x)))
            .na.drop(subset=["__d"])
            .groupBy(F.col("__d").alias(x))
            .agg(*[F.sum(yf).alias(yf) for yf in chart["y_fields"]])
            .orderBy(x)
        )
    elif ctype == "bar":
        out = vp.bar_prep(df, x, chart["y"], top_n=chart.get("top_n", 15))
    elif ctype == "line":
        out = vp.line_prep(df, x, chart["y"])
    elif ctype == "pie":
        out = vp.pie_prep(df, x, top_n=chart.get("top_n", 10))
    elif ctype == "histogram":
        binned = vp.histogram_prep(df, x, bins=chart.get("bins", 30))
        # config adapter keys histogram bars by the x field name
        return [
            {x: r["bin"], "count": r["count"]}
            for r in binned.limit(max_rows).collect()
        ]
    elif ctype == "scatter":
        out = vp.scatter_prep(df, x, chart["y"], max_points=chart.get("sample", 1000))
    elif ctype == "box":
        summary = vp.box_prep(df, x, chart["y"])
        # ECharts boxplot wants [min, q1, median, q3, max] per category
        return [
            {
                x: r[x],
                chart["y"]: [r["min"], r["q1"], r["median"], r["q3"], r["max"]],
            }
            for r in summary.limit(max_rows).collect()
        ]
    elif ctype == "heatmap":
        z = chart.get("z", "value")
        out = df.groupBy(x, chart["y"]).agg(F.sum(z).alias(z))
    else:
        raise ValueError(f"chart_records: unknown chart type {ctype!r}")
    return [r.asDict(recursive=True) for r in out.limit(max_rows).collect()]


# -- NL prompt → chart (reference generate_custom_chart) --------------
#
# Keyword tables ported verbatim from
# src/api/visualization_generator.py:553-568 — the elif ORDER is the
# spec: 'distribution' appears under both pie and histogram, and the
# reference's pie branch wins because it is checked first.
_PROMPT_CHART_KEYWORDS: list[tuple[str, tuple[str, ...]]] = [
    ("line", ("line", "trend", "over time", "timeline")),
    ("pie", ("pie", "distribution", "breakdown")),
    ("scatter", ("scatter", "correlation", "vs", "versus")),
    ("histogram", ("histogram", "distribution")),  # dead 'distribution': pie wins, kept verbatim
    ("box", ("box", "boxplot")),
    ("heatmap", ("heatmap", "heat map")),
]


def parse_chart_prompt(
    prompt: str,
    columns: list[str],
    profile: Optional[dict[str, Any]] = None,
) -> dict[str, Any]:
    """Keyword-matched chart config from a natural-language prompt —
    the reference's ``generate_custom_chart`` interpretation step
    (visualization_generator.py:527-610, served by main.py:1300's
    ``POST /api/analytics/visualizations/custom`` for the AI-chat
    flow), deterministic and LLM-free:

    - chart type: first keyword family that matches (ordered table
      above), default ``bar`` (ref :552-568);
    - columns: every column whose lowercased name — or its
      underscores-as-spaces form — is a substring of the prompt, in
      frame column order (ref :570-576);
    - fallback when nothing is mentioned (ref :578-590): for bar/pie
      the first non-ID categorical plus the first non-ID numeric,
      for line/histogram the first non-ID numeric — the roles come
      from the same profile analysis ``rank_charts`` uses (the house
      analyzer stands in for the reference's pandas
      ``analyze_dataframe``); scatter/box/heatmap get no fallback,
      exactly like the reference;
    - x = first pick else the frame's first column, y = second pick
      else None, title = prompt truncated at 50 chars (ref :592-598).
    """
    prompt_lower = prompt.lower()

    chart_type = "bar"  # default (ref :552)
    for ctype, words in _PROMPT_CHART_KEYWORDS:
        if any(w in prompt_lower for w in words):
            chart_type = ctype
            break

    mentioned: list[str] = []
    for col in columns:
        low = col.lower()
        if low in prompt_lower or low.replace("_", " ") in prompt_lower:
            mentioned.append(col)

    if not mentioned and profile is not None:
        rows = profile["row_count"]
        cols = profile["columns"]
        roles = {n: analyze_column(n, i, rows) for n, i in cols.items()}
        numeric = [
            n for n, i in cols.items()
            if i["type"] == "numeric" and not roles[n]["is_id"]
        ]
        categorical = [
            n for n, i in cols.items()
            if i["type"] == "categorical" and not roles[n]["is_id"]
        ]
        if chart_type in ("bar", "pie") and categorical:
            mentioned = [categorical[0]]
            if numeric:
                mentioned.append(numeric[0])
        elif chart_type in ("line", "histogram") and numeric:
            mentioned = [numeric[0]]

    return {
        "chart_type": chart_type,
        "title": prompt[:50] + ("..." if len(prompt) > 50 else ""),
        "x_column": mentioned[0] if mentioned else (columns[0] if columns else None),
        "y_column": mentioned[1] if len(mentioned) > 1 else None,
    }


def custom_chart(
    df, prompt: str, profile: Optional[dict[str, Any]] = None
) -> Optional[dict[str, Any]]:
    """Prompt → one rendered chart dict, or None when the request
    can't be satisfied — the reference returns None for every
    execution failure (generate_plotly_chart wraps each per-type
    branch in one except that swallows and returns None, ref
    :376-465) and the route turns None into a "Could not generate
    chart" payload (main.py:1340-1346). The execution rides the same
    distributed chart-prep aggregates as the auto-chart batch
    (``chart_records``), so the collect only ever sees an
    aggregated / top-n / sampled frame. None cases, vs the
    reference: bar/line with no y die identically
    (``df.groupby(x)[None]`` raises → None, ref :379/:387); heatmap
    prompts return None because the custom path never parses a z
    column and ``pivot_table(values=None)`` dies the same way (ref
    :446); scatter/box with no y are a DOCUMENTED conservative
    divergence — plotly express would render a degenerate one-axis
    chart there, we decline instead of inventing an axis."""
    from ai_etl_framework_spark.plans.profile import profile_schema

    prof = profile or profile_schema(df)
    cfg = parse_chart_prompt(prompt, df.columns, prof)
    ctype, x, y = cfg["chart_type"], cfg["x_column"], cfg["y_column"]

    if ctype == "bar":
        spec = {"type": "bar", "x": x, "y": y, "agg": "sum", "top_n": 15}
    elif ctype == "line":
        spec = {"type": "line", "x": x, "y": y}
    elif ctype == "pie":
        spec = {"type": "pie", "x": x, "top_n": 10}
    elif ctype == "histogram":
        spec = {"type": "histogram", "x": x, "bins": 30}
    elif ctype == "scatter":
        spec = {"type": "scatter", "x": x, "y": y, "sample": 1000}
    elif ctype == "box":
        spec = {"type": "box", "x": x, "y": y}
    else:  # heatmap — no z in the custom path (ref :446 fails the same way)
        return None
    if ctype in ("bar", "line", "scatter", "box") and y is None:
        return None  # ref: groupby/px call raises on y=None → except → None

    try:
        records = chart_records(df, spec)
        config = echarts_config(spec, records)
    except Exception:  # noqa: BLE001 — per-chart isolation (ref :456-460)
        return None
    return {
        "chart_type": ctype,
        "title": cfg["title"],
        "x_column": x,
        "y_column": y,
        "chart_config": config,
    }


def generate_all_charts(
    df, max_charts: int = 10, profile: Optional[dict[str, Any]] = None
) -> list[dict[str, Any]]:
    """Profile → rank → execute → ECharts config, one list — the
    engine-side analog of visualization_generator.generate_all_charts
    (ref :27-74, called by main.py:1263's background task). One failed
    chart must not kill the batch (ref wraps each chart in try/except
    the same way) — failures ride along as {"spec", "error"} items so
    the caller sees WHICH chart failed instead of a silent drop."""
    from ai_etl_framework_spark.plans.profile import profile_schema

    prof = profile or profile_schema(df)
    out: list[dict[str, Any]] = []
    for spec in rank_charts(prof, max_charts=max_charts):
        try:
            records = chart_records(df, spec)
            out.append(
                {
                    "spec": spec,
                    "config": echarts_config(spec, records),
                    "rows": len(records),
                }
            )
        except Exception as ex:  # noqa: BLE001 — per-chart isolation (ref :56-60)
            out.append({"spec": spec, "error": str(ex)})
    return out
