"""Property-based differential testing of sessionize_batch: ANY random
small event set must produce the same sessions from the Spark
window/cumsum formulation and from a direct Python model of the
semantics (q28's oracle contract):

- events with NULL ts are dropped (not sessionizable)
- NULL user_id forms its own group (like SQL GROUP BY)
- a session breaks when the gap to the previous event exceeds `gap`
  (strictly greater; an exact-gap event stays in the session)
- total_value = SUM semantics: NULL contributes nothing, all-NULL
  session -> NULL (the boundary the r4 streaming-kernel fix pinned)
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_etl_framework_spark.streaming.sessions import sessionize_batch

T0 = datetime(2024, 1, 1)
GAP_S = 600.0  # gap_minutes=10

events_strategy = st.lists(
    st.tuples(
        st.sampled_from([1, 2, None]),                      # user_id
        st.one_of(st.none(), st.integers(0, 5000)),         # ts offset (s)
        st.one_of(st.none(), st.integers(-50, 50)),         # value
    ),
    min_size=1,
    max_size=14,
)


def _model(rows):
    per_user: dict = {}
    for u, ts, v in rows:
        if ts is None:
            continue
        per_user.setdefault(u, []).append((ts, v))
    out = set()
    for u, evs in per_user.items():
        evs.sort(key=lambda e: e[0])
        sessions, cur = [], [evs[0]]
        for e in evs[1:]:
            if e[0] - cur[-1][0] > GAP_S:
                sessions.append(cur)
                cur = [e]
            else:
                cur.append(e)
        sessions.append(cur)
        for s in sessions:
            vals = [v for _, v in s if v is not None]
            out.add((
                u,
                s[0][0],
                s[-1][0],
                len(s),
                float(sum(vals)) if vals else None,
            ))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=events_strategy)
def test_sessionize_batch_matches_python_model(spark, rows):
    data = [
        (
            u,
            (T0 + timedelta(seconds=ts)) if ts is not None else None,
            float(v) if v is not None else None,
        )
        for u, ts, v in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, value double"
    )
    got = {
        (
            r["user_id"],
            (r["session_start"] - T0).total_seconds(),
            (r["session_end"] - T0).total_seconds(),
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize_batch(df, gap_minutes=GAP_S / 60.0).collect()
    }
    assert got == _model(rows)
