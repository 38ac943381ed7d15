"""Property-based differential testing of AnomalyDetector: ANY random
small numeric batch must produce the same per-row flags from the Spark
expression tree and from a direct numpy model of the reference
semantics (q10's oracle contract):

- z-score: population stddev, usable only when cnt >= 3 and std > 0
- IQR: exact linear-interpolation percentiles, usable when cnt >= 4
  and IQR > 0, fences at q1/q3 -/+ threshold*IQR (strict <, >)
- combined: both legs agree (>= 2 votes with the container's two
  voters)
- NULL values are never anomalous and are excluded from the stats
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_etl_framework_spark.operators import AnomalyDetector

values_strategy = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-50, max_value=50, allow_nan=False)
        .map(lambda x: round(x, 2)),
        # occasional far outlier so flags actually fire
        st.sampled_from([500.0, -500.0]),
    ),
    min_size=1,
    max_size=15,
)


def _model(vals, method, threshold):
    xs = np.array([v for v in vals if v is not None], dtype=float)
    n = xs.size

    def z_flag(v):
        if v is None or n < 3:
            return False
        std = xs.std()  # population
        if std <= 0:
            return False
        return abs(v - xs.mean()) / std > threshold

    def iqr_flag(v):
        if v is None or n < 4:
            return False
        q1, q3 = np.percentile(xs, [25, 75])
        iqr = q3 - q1
        if iqr <= 0:
            return False
        return v < q1 - threshold * iqr or v > q3 + threshold * iqr

    out = []
    for v in vals:
        if method == "statistical":
            out.append(z_flag(v))
        elif method == "iqr":
            out.append(iqr_flag(v))
        else:
            out.append(z_flag(v) and iqr_flag(v))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=values_strategy,
       method=st.sampled_from(["statistical", "iqr", "combined"]))
def test_anomaly_flags_match_numpy_model(spark, vals, method):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "rid int, x double"
    )
    det = AnomalyDetector(method=method, threshold=1.0, fields=["x"])
    got = {
        r["rid"]: r["_meta_is_anomaly"] for r in det(df).collect()
    }
    expected = _model(vals, method, 1.0)
    assert [got[i] for i in range(len(vals))] == expected
