"""LLM-insight context builder.

Reference: src/api/insight_generator.py:18-258 — samples ≤1000 rows,
builds a profile context (dtypes, null counts, min/max/mean, 5 sample
rows) and sends it to an LLM in JSON mode for {summary, insights}.

The context building is engine work (distributed aggregates + bounded
sample) and is implemented here; the LLM call itself is gated behind
an import/credential check and returns the prepared payload when no
client is available, so the engine surface is testable offline.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from ai_etl_framework_spark.plans.profile import profile_schema


def build_insight_context(
    df: DataFrame, sample_rows: int = 5, max_profile_rows: int = 1000
) -> dict[str, Any]:
    """Profile context for the LLM prompt (ref :18-120): column dtypes
    + null counts + numeric min/max/avg over a BOUNDED slice
    (``max_profile_rows``, the reference's ≤1000-row sample — an LLM
    context never needs exact full-table statistics, and profiling the
    whole table would run exact countDistinct over every row), plus a
    deterministic sample of rows. ``profiled_rows`` says how many rows
    the statistics describe."""
    from pyspark.sql import functions as F

    bounded = df.limit(max_profile_rows)
    prof = profile_schema(bounded)
    nulls = bounded.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    ).collect()[0].asDict()
    columns = {}
    for name, info in prof["columns"].items():
        cleaned = {k: v for k, v in info.items() if k != "values"}
        cleaned["null_count"] = int(nulls.get(name) or 0)
        columns[name] = cleaned
    sample = [r.asDict(recursive=True) for r in df.limit(sample_rows).collect()]
    return {
        # the TRUE table size (one count scan, no per-row collection) —
        # only the statistics are computed over the bounded slice. A
        # 5M-row table must not tell the LLM it has 1000 rows.
        "row_count": df.count(),
        "profiled_rows": prof["row_count"],
        "columns": columns,
        "suggested_dimensions": prof["suggested_dimensions"],
        "suggested_metrics": prof["suggested_metrics"],
        "sample_rows": sample,
    }


def generate_insights(df: DataFrame, client: Any = None, model: str | None = None) -> dict[str, Any]:
    """If an LLM ``client`` is supplied (OpenAI-compatible, like the
    reference's), ask it for {summary, insights}; otherwise return the
    context payload with a null summary — the caller decides."""
    context = build_insight_context(df)
    if client is None:
        return {"summary": None, "insights": [], "context": context}
    import json

    resp = client.chat.completions.create(
        model=model or "gpt-4o-mini",  # ref :41 default model name
        response_format={"type": "json_object"},
        messages=[
            {
                "role": "user",
                "content": (
                    "Given this dataset profile, return JSON with keys "
                    '"summary" (string) and "insights" (3-5 strings): '
                    + json.dumps(context, default=str)
                ),
            }
        ],
    )
    out = json.loads(resp.choices[0].message.content)
    out["context"] = context
    return out
