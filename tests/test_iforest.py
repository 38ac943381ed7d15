"""Isolation-forest unit suite — the differential evidence the r12
changelog/x04 docstring cite: multiset determinism (the lexsort-
before-fit property that justifies the fixture oracle), the shared
contamination→flag rule, obvious-outlier detection, and global≡model
path agreement."""

from __future__ import annotations

import numpy as np
import pytest

from ai_etl_framework_spark.operators.iforest import (
    IsolationForestNp,
    _fit_order,
    fit_predict_global,
    fit_sample_predict_distributed,
    flags_from_scores,
)


def _xy(spark, rows):
    return spark.createDataFrame(rows, "event_id long, value double, user_id double")


def _cluster_with_outliers():
    rng = np.random.RandomState(0)
    x = rng.normal(0.0, 1.0, size=(200, 2))
    x[0] = [25.0, 25.0]
    x[1] = [-30.0, 18.0]
    return x


def test_flags_from_scores_rule():
    scores = np.array([0.1, 0.9, 0.5, 0.8, 0.2])
    # contamination 0.4 of 5 -> k=2: the top-2 scores flag
    assert list(flags_from_scores(scores, 0.4)) == [False, True, False, True, False]
    # k floors at 1 even for tiny contamination
    assert flags_from_scores(scores, 1e-9).sum() == 1
    # ties AT the threshold all flag
    tied = np.array([0.9, 0.9, 0.1])
    assert flags_from_scores(tied, 1 / 3).sum() == 2


def test_model_flags_obvious_outliers():
    x = _cluster_with_outliers()
    flags = IsolationForestNp(contamination=0.05, random_state=42).fit_predict(x)
    assert bool(flags[0]) and bool(flags[1])
    assert flags.sum() == max(1, round(0.05 * len(x)))


def test_fit_is_multiset_deterministic():
    """The r12 property behind the x04 fixture oracle: permuting the
    input rows changes NOTHING once the caller fits on a lexsorted
    view — the model (and hence every score) is a pure function of
    the row multiset."""
    x = _cluster_with_outliers()
    rng = np.random.RandomState(7)
    perm = rng.permutation(len(x))
    a = IsolationForestNp(random_state=42).fit(x[_fit_order(x)])
    xp = x[perm]
    b = IsolationForestNp(random_state=42).fit(xp[_fit_order(xp)])
    probe = x[:20]
    assert np.array_equal(a.score(probe), b.score(probe))


def test_fit_predict_global_matches_local_model(spark):
    """The Spark global path reproduces the local model exactly: same
    lexsorted fit, same shared flag rule, row-aligned output."""
    x = _cluster_with_outliers()
    rows = [(i, float(v0), float(v1)) for i, (v0, v1) in enumerate(x)]
    df = _xy(spark, rows)
    out = fit_predict_global(df, ["value", "user_id"])
    got = {
        r["event_id"]: r["_meta_is_anomaly"] for r in out.collect()
    }
    model = IsolationForestNp(random_state=42).fit(x[_fit_order(x)])
    expected = flags_from_scores(model.score(x), 0.1)
    assert got == {i: bool(f) for i, f in enumerate(expected)}
    assert got[0] and got[1]


def test_global_path_permutation_invariant(spark):
    x = _cluster_with_outliers()
    rows = [(i, float(v0), float(v1)) for i, (v0, v1) in enumerate(x)]
    base = {r["event_id"]: r["_meta_is_anomaly"]
            for r in fit_predict_global(_xy(spark, rows), ["value", "user_id"]).collect()}
    shuffled = list(reversed(rows))
    again = {r["event_id"]: r["_meta_is_anomaly"]
             for r in fit_predict_global(
                 _xy(spark, shuffled).repartition(7), ["value", "user_id"]).collect()}
    assert base == again


def test_global_path_imputes_nulls_with_column_means(spark):
    rows = [(i, float(i % 5), 1.0) for i in range(60)]
    rows.append((998, None, 1.0))      # NULL value -> mean-imputed, kept
    rows.append((999, 50.0, 50.0))     # the outlier
    df = _xy(spark, rows)
    out = {r["event_id"]: r["_meta_is_anomaly"]
           for r in fit_predict_global(df, ["value", "user_id"]).collect()}
    assert len(out) == 62              # imputation keeps the NULL row
    assert out[999]


def test_distributed_path_flags_and_scores(spark):
    x = _cluster_with_outliers()
    rows = [(i, float(v0), float(v1)) for i, (v0, v1) in enumerate(x)]
    out = fit_sample_predict_distributed(
        _xy(spark, rows), ["value", "user_id"], sample_rows=1000
    )
    got = {r["event_id"]: (r["_meta_is_anomaly"], r["_meta_anomaly_score"])
           for r in out.collect()}
    assert got[0][0] and got[1][0]
    # scores are per-row deterministic given the model: outliers score
    # strictly above the cluster median score
    med = float(np.median([s for _, s in got.values()]))
    assert got[0][1] > med and got[1][1] > med


def test_fit_order_handles_ties_and_is_stable():
    x = np.array([[1.0, 2.0], [0.0, 5.0], [1.0, 1.0], [0.0, 5.0]])
    order = _fit_order(x)
    assert [tuple(v) for v in x[order]] == sorted(tuple(v) for v in x)
    with pytest.raises(Exception):
        # malformed: _fit_order is column-wise; a 1-D array has no
        # column tuple to sort by in the same contract
        _fit_order(np.array([]))
