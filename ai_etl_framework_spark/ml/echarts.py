"""ECharts option generation — full parity with the reference's
chart surface (src/api/echarts_generator.py).

Covers the 9 declared chart types (:14-24) — bar, line, pie, scatter,
area, treemap, sunburst, heatmap, gauge — plus dtype/cardinality
chart-type suggestion (:446-487), multi-series configs (:488-556) and
interactive-feature decoration (:558-616). ``sunburst`` has no
dedicated builder in the reference (it is absent from the dispatch
table at :50-59 and falls through to bar); we reproduce that fallback
so a config round-trip behaves identically.

Divergences (documented, deliberate):

- **JSON-safe output.** The reference embeds Python lambdas in three
  places (bar ``animationDelay`` :105, scatter ``symbolSize`` :239 and
  tooltip ``formatter`` :245). A lambda cannot survive JSON
  serialization, so those configs would fail at the FastAPI boundary;
  we emit the JSON equivalents instead (a numeric per-point
  ``symbolSize`` list, a template-string formatter) and omit the
  cosmetic ``animationDelay``. Every config this module returns is
  ``json.dumps``-able — tested.
- **``stacked`` works.** The reference's bar builder accepts
  ``stacked`` (:71) but never reads it; here ``stacked=True`` sets
  ``"stack": "total"`` on the series.
- **Spark-native suggestion.** ``suggest_chart_type`` takes a Spark
  DataFrame (dtype from the schema, cardinality via one
  ``approx_count_distinct`` job) instead of a pandas frame — same
  decision table, same rule order.
"""

from __future__ import annotations

import json
from typing import Any, Optional

CHART_TYPES = (
    "bar", "line", "pie", "scatter", "area",
    "treemap", "sunburst", "heatmap", "gauge",
)

_GRID = {"left": "3%", "right": "4%", "bottom": "3%", "containLabel": True}


def _grid(title: Optional[str], **over: Any) -> dict[str, Any]:
    g = dict(_GRID, top="15%" if title else "8%")
    g.update(over)
    return g


def _titled(config: dict[str, Any], title: Optional[str]) -> dict[str, Any]:
    if title:
        config["title"] = {"text": title, "left": "center"}
    return config


def _xy(data: list[dict], x_field: str, y_field: str) -> tuple[list[str], list[Any]]:
    return (
        [str(d.get(x_field, "")) for d in data],
        [d.get(y_field, 0) for d in data],
    )


def _named_values(data: list[dict], name_field: str, value_field: str) -> list[dict]:
    return [
        {"name": str(d.get(name_field, "")), "value": d.get(value_field, 0)}
        for d in data
    ]


def _bar(data, x_field, y_field, title=None, horizontal=False, stacked=False, **kw):
    """ref :65-111; borderRadius rotates with orientation."""
    cats, vals = _xy(data, x_field, y_field)
    series = {
        "type": "bar",
        "data": vals,
        "emphasis": {"focus": "series"},
        "itemStyle": {"borderRadius": [0, 4, 4, 0] if horizontal else [4, 4, 0, 0]},
    }
    if stacked:
        series["stack"] = "total"
    cat_axis = {"type": "category", "data": cats}
    val_axis = {"type": "value"}
    return _titled({
        "tooltip": {"trigger": "axis", "axisPointer": {"type": "shadow"}},
        "grid": _grid(title),
        "xAxis": val_axis if horizontal else cat_axis,
        "yAxis": cat_axis if horizontal else val_axis,
        "series": [series],
        "animationEasing": "elasticOut",
    }, title)


def _line(data, x_field, y_field, title=None, smooth=True, area=False, **kw):
    """ref :114-157."""
    cats, vals = _xy(data, x_field, y_field)
    series = {
        "type": "line",
        "data": vals,
        "smooth": smooth,
        "emphasis": {"focus": "series"},
        "symbol": "circle",
        "symbolSize": 6,
    }
    if area:
        series["areaStyle"] = {"opacity": 0.3}
    return _titled({
        "tooltip": {"trigger": "axis"},
        "grid": _grid(title),
        "xAxis": {"type": "category", "data": cats, "boundaryGap": False},
        "yAxis": {"type": "value"},
        "series": [series],
    }, title)


def _area(data, x_field, y_field, title=None, **kw):
    """ref :266-274 — smoothed line with areaStyle."""
    return _line(data, x_field, y_field, title, smooth=True, area=True, **kw)


def _pie(data, x_field, y_field, title=None, donut=False, **kw):
    """ref :160-204."""
    return _titled({
        "tooltip": {"trigger": "item", "formatter": "{b}: {c} ({d}%)"},
        "legend": {"orient": "horizontal", "bottom": "5%"},
        "series": [{
            "type": "pie",
            "radius": ["40%", "70%"] if donut else "70%",
            "center": ["50%", "45%"],
            "data": _named_values(data, x_field, y_field),
            "emphasis": {"itemStyle": {
                "shadowBlur": 10, "shadowOffsetX": 0,
                "shadowColor": "rgba(0, 0, 0, 0.5)",
            }},
            "label": {"show": True, "formatter": "{b}: {d}%"},
            "animationType": "scale",
            "animationEasing": "elasticOut",
        }],
    }, title)


def _scatter(data, x_field, y_field, title=None, size_field=None, **kw):
    """ref :207-263. The reference sizes points and formats tooltips
    with lambdas; we emit the JSON equivalents (per-point [x, y, size]
    triples + a template formatter)."""
    series: dict[str, Any] = {
        "type": "scatter",
        "emphasis": {
            "focus": "series",
            "itemStyle": {"shadowBlur": 10, "shadowColor": "rgba(0, 0, 0, 0.5)"},
        },
    }
    if size_field:
        # SQL NULL size → default 10, like a missing key (a bare
        # max()/division over None raises TypeError)
        sizes = [
            s if (s := d.get(size_field)) is not None else 10 for d in data
        ]
        peak = max(sizes) if sizes else 1
        series["data"] = [
            {
                "value": [d.get(x_field, 0), d.get(y_field, 0)],
                "symbolSize": (s / peak) * 40 + 5 if peak else 5,
            }
            for d, s in zip(data, sizes)
        ]
    else:
        series["data"] = [[d.get(x_field, 0), d.get(y_field, 0)] for d in data]
        series["symbolSize"] = 12
    return _titled({
        "tooltip": {
            "trigger": "item",
            # {@[0]}/{@[1]} index into the [x, y] value under an
            # item trigger; {c0}/{c1} do NOT decompose the pair (both
            # render the joined "x, y" string)
            "formatter": f"{x_field}: {{@[0]}}<br/>{y_field}: {{@[1]}}",
        },
        "grid": _grid(title),
        "xAxis": {"type": "value", "name": x_field},
        "yAxis": {"type": "value", "name": y_field},
        "series": [series],
    }, title)


def _treemap(data, name_field, value_field, title=None, **kw):
    """ref :277-322."""
    return _titled({
        "tooltip": {"trigger": "item", "formatter": "{b}: {c}"},
        "series": [{
            "type": "treemap",
            "data": _named_values(data, name_field, value_field),
            "leafDepth": 1,
            "roam": False,
            "label": {"show": True, "formatter": "{b}"},
            "upperLabel": {"show": True, "height": 30},
            "itemStyle": {"borderColor": "#0f1428", "borderWidth": 2, "gapWidth": 2},
            "emphasis": {"itemStyle": {
                "shadowBlur": 20, "shadowColor": "rgba(0, 0, 0, 0.4)",
            }},
        }],
    }, title)


def _heatmap(data, x_field, y_field, value_field="value", title=None, **kw):
    """ref :325-394 — (x-index, y-index, value) triples over sorted
    category axes + a visualMap spanning the value range."""
    xs = sorted({str(d.get(x_field, "")) for d in data})
    ys = sorted({str(d.get(y_field, "")) for d in data})
    x_pos = {c: i for i, c in enumerate(xs)}
    y_pos = {c: i for i, c in enumerate(ys)}
    cells = [
        [
            x_pos[str(d.get(x_field, ""))],
            y_pos[str(d.get(y_field, ""))],
            v if (v := d.get(value_field)) is not None else 0,
        ]
        for d in data
    ]
    vals = [c[2] for c in cells]
    return _titled({
        "tooltip": {"position": "top"},
        "grid": _grid(title, bottom="15%", top="15%"),
        "xAxis": {"type": "category", "data": xs, "splitArea": {"show": True}},
        "yAxis": {"type": "category", "data": ys, "splitArea": {"show": True}},
        "visualMap": {
            "min": min(vals) if vals else 0,
            "max": max(vals) if vals else 100,
            "calculable": True,
            "orient": "horizontal",
            "left": "center",
            "bottom": "0%",
            "inRange": {"color": ["#1a1f35", "#7dd3fc"]},
        },
        "series": [{
            "type": "heatmap",
            "data": cells,
            "label": {"show": True},
            "emphasis": {"itemStyle": {
                "shadowBlur": 10, "shadowColor": "rgba(0, 0, 0, 0.5)",
            }},
        }],
    }, title)


def _gauge(data, value_field, _y_unused=None, title=None, max_value=100, **kw):
    """ref :397-443 — single-value dial from the first record."""
    value = data[0].get(value_field, 0) if data else 0
    return _titled({
        "tooltip": {"formatter": "{b}: {c}"},
        "series": [{
            "type": "gauge",
            "progress": {"show": True, "width": 18},
            "axisLine": {"lineStyle": {"width": 18}},
            "axisTick": {"show": False},
            "splitLine": {"length": 15, "lineStyle": {"width": 2, "color": "#9ca3af"}},
            "axisLabel": {"distance": 25, "color": "#9ca3af", "fontSize": 12},
            "anchor": {
                "show": True, "showAbove": True, "size": 25,
                "itemStyle": {"borderWidth": 10},
            },
            "title": {"show": False},
            "detail": {
                "valueAnimation": True, "fontSize": 32,
                "offsetCenter": [0, "70%"], "color": "#ffffff",
            },
            "data": [{"value": value, "name": title or "Value"}],
            "max": max_value,
        }],
    }, title)


_BUILDERS = {
    "bar": _bar,
    "line": _line,
    "pie": _pie,
    "scatter": _scatter,
    "area": _area,
    "treemap": _treemap,
    "heatmap": _heatmap,
    "gauge": _gauge,
    # "sunburst" intentionally absent — the reference's dispatch table
    # (:50-59) omits it too, so it falls back to bar below.
}


def generate_echarts_config(
    data: list[dict],
    chart_type: str,
    x_field: str,
    y_field: str,
    title: Optional[str] = None,
    **kwargs: Any,
) -> dict[str, Any]:
    """Build an ECharts option dict (ref :27-62). Unknown / unmapped
    chart types fall back to bar, like the reference's dispatch."""
    builder = _BUILDERS.get(str(chart_type), _bar)
    if builder is _gauge:
        # gauge keys off value_field only (ref :397-406)
        return _gauge(data, kwargs.pop("value_field", y_field or x_field),
                      title=title, **kwargs)
    config = builder(data, x_field, y_field, title=title, **kwargs)
    # prove the JSON-safety contract cheaply at build time
    assert json.dumps(config) is not None
    return config


def suggest_chart_type(df, x_col: str, y_col: str) -> str:
    """Reference decision table (:446-485), evaluated Spark-side.
    Rule order matters and is preserved: temporal x → line; 2-6
    distinct x → pie; ≤20 → bar; numeric×numeric → scatter; else bar.
    Cardinality comes from one approx_count_distinct job (exactness
    is irrelevant at the 6/20 thresholds' error bars for the small
    aggregate results this runs on)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    fields = {f.name: f.dataType for f in df.schema.fields}
    if x_col not in fields or y_col not in fields:
        return "bar"
    numeric = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.DecimalType)
    if isinstance(fields[x_col], (T.DateType, T.TimestampType)):
        return "line"
    n = df.agg(F.approx_count_distinct(x_col).alias("n")).collect()[0]["n"]
    if 2 <= n <= 6:
        return "pie"
    if n <= 20:
        return "bar"
    if isinstance(fields[x_col], numeric) and isinstance(fields[y_col], numeric):
        return "scatter"
    return "bar"


def generate_multi_series_config(
    data: list[dict],
    x_field: str,
    y_fields: list[str],
    chart_type: str = "line",
    title: Optional[str] = None,
    **kwargs: Any,
) -> dict[str, Any]:
    """One series per y_field, shared category axis (ref :488-556)."""
    cats = [str(d.get(x_field, "")) for d in data]
    is_bar = chart_type == "bar"
    series = []
    for y in y_fields:
        s: dict[str, Any] = {
            "name": y,
            "type": chart_type,
            "data": [d.get(y, 0) for d in data],
            "emphasis": {"focus": "series"},
        }
        if chart_type == "line":
            s.update(smooth=True, symbol="circle", symbolSize=6)
        elif is_bar:
            s["itemStyle"] = {"borderRadius": [4, 4, 0, 0]}
        series.append(s)
    return _titled({
        "tooltip": {
            "trigger": "axis",
            "axisPointer": {"type": "shadow" if is_bar else "line"},
        },
        "legend": {"data": list(y_fields), "bottom": "0%"},
        "grid": _grid(title, bottom="12%", top="15%"),
        "xAxis": {"type": "category", "data": cats, "boundaryGap": is_bar},
        "yAxis": {"type": "value"},
        "series": series,
    }, title)


def add_interactive_features(
    config: dict[str, Any],
    enable_zoom: bool = False,
    enable_brush: bool = False,
    enable_toolbox: bool = True,
) -> dict[str, Any]:
    """Decorate a config with toolbox / dataZoom / brush (ref :558-616)."""
    if enable_toolbox:
        config["toolbox"] = {"feature": {
            "saveAsImage": {"title": "Save"},
            "dataView": {"title": "Data", "readOnly": True},
            "restore": {"title": "Reset"},
        }}
    if enable_zoom:
        config["dataZoom"] = [
            {"type": "inside", "start": 0, "end": 100},
            {"type": "slider", "start": 0, "end": 100, "bottom": "0%"},
        ]
        if "grid" in config:
            config["grid"]["bottom"] = "15%"
    if enable_brush:
        config["brush"] = {
            "toolbox": ["rect", "polygon", "keep", "clear"],
            "brushLink": "all",
            "throttleType": "debounce",
            "throttleDelay": 300,
        }
        if "toolbox" in config and "feature" in config["toolbox"]:
            config["toolbox"]["feature"]["brush"] = {"type": ["rect", "polygon", "clear"]}
    return config
