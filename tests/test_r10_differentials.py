"""Randomized differentials for the r10 families with independent
model implementations: gini vs a numpy closed form, quantile
normalization vs scipy-free rank math, PMI vs a brute-force python
count, TWAP vs a pandas loop, Welch vs statistics-module math over
random arms. Complements test_r10_operators' pinned values with
breadth."""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

import pytest

T0 = datetime(2024, 3, 1, 0, 0, 0)


def test_gini_matches_numpy_model(spark):
    import numpy as np

    from ai_etl_framework_spark.operators.stats import gini

    rng = random.Random(5)
    rows = []
    for g in range(6):
        for _ in range(rng.randint(2, 40)):
            rows.append((f"g{g}", round(rng.uniform(0, 100), 3)))
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["gini"] for r in gini(df, "g", "v").collect()}
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, xs in by_g.items():
        x = np.sort(np.asarray(xs))
        n = len(x)
        i = np.arange(1, n + 1)
        model = 2.0 * float((i * x).sum()) / (n * float(x.sum())) - (n + 1) / n
        assert got[g] == pytest.approx(model, abs=2e-6), g


def test_quantile_normalize_matches_rank_model(spark):
    from ai_etl_framework_spark.operators.scaling import quantile_normalize

    rng = random.Random(9)
    rows = [(f"g{i % 3}", float(rng.randint(0, 20))) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = quantile_normalize(df, "v", group_col="g").collect()
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for r in got:
        xs = by_g[r["g"]]
        n = len(xs)
        # percent_rank = (#strictly smaller)/(n-1)
        model = sum(1 for x in xs if x < r["v"]) / (n - 1)
        assert r["qn"] == pytest.approx(round(model, 6), abs=1e-9)


def test_pmi_matches_bruteforce(spark):
    from ai_etl_framework_spark.operators.collocations import (
        pmi_collocations,
    )

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for _ in range(120)
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
           for r in pmi_collocations(df, min_count=2, top_k=1000).collect()}
    uni: dict[str, int] = {}
    pair: dict[tuple, int] = {}
    n_tok = n_bi = 0
    for t in docs:
        toks = [w for w in t.lower().split() if w]
        n_tok += len(toks)
        for a, b in zip(toks, toks[1:]):
            pair[(a, b)] = pair.get((a, b), 0) + 1
            n_bi += 1
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
    model = {
        k: (c, round(math.log((c / n_bi) / ((uni[k[0]] / n_tok) * (uni[k[1]] / n_tok))), 6))
        for k, c in pair.items() if c >= 2
    }
    assert set(out) == set(model)
    for k in model:
        assert out[k][0] == model[k][0]
        assert out[k][1] == pytest.approx(model[k][1], abs=1e-6)


def test_twap_matches_pandas_model(spark):
    from ai_etl_framework_spark.operators.timeseries import time_weighted_avg

    rng = random.Random(21)
    rows = []
    eid = 0
    truth: dict[str, tuple] = {}
    for key in ("a", "b", "c"):
        ticks = sorted(rng.sample(range(0, 5000), rng.randint(2, 60)))
        vals = [round(rng.uniform(1, 50), 2) for _ in ticks]
        num = den = 0.0
        for (t1, v), t2 in zip(zip(ticks, vals), ticks[1:]):
            num += v * (t2 - t1)
            den += t2 - t1
        truth[key] = num / den
        for t, v in zip(ticks, vals):
            rows.append((eid, T0 + timedelta(seconds=t), key, v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {r["event_type"]: r["twap"] for r in time_weighted_avg(df).collect()}
    for k, v in truth.items():
        assert got[k] == pytest.approx(round(v, 6), abs=1e-5), k


def test_ab_test_random_arms(spark):
    import statistics as st

    from ai_etl_framework_spark.operators.abtest import ab_test

    rng = random.Random(31)
    rows = []
    arms: dict[tuple, list] = {}
    for e in ("e1", "e2"):
        for variant in ("control", "v1", "v2"):
            vals = [round(rng.gauss(10 + (variant != "control"), 2), 4)
                    for _ in range(rng.randint(3, 30))]
            arms[(e, variant)] = vals
            rows += [(e, variant, v) for v in vals]
    df = spark.createDataFrame(rows, "exp string, variant string, v double")
    got = {(r["experiment"], r["variant"]): r
           for r in ab_test(df, "exp", "variant", "v", control="control").collect()}
    for e in ("e1", "e2"):
        ctrl = arms[(e, "control")]
        for variant in ("v1", "v2"):
            vs = arms[(e, variant)]
            se2 = st.variance(vs) / len(vs) + st.variance(ctrl) / len(ctrl)
            t = (st.mean(vs) - st.mean(ctrl)) / se2 ** 0.5
            r = got[(e, variant)]
            assert r["t_stat"] == pytest.approx(round(t, 6), abs=1e-6)
            assert r["n_variant"] == len(vs) and r["n_control"] == len(ctrl)


def test_ohlc_matches_sorted_model(spark):
    from ai_etl_framework_spark.operators.timeseries import ohlc_bars

    rng = random.Random(41)
    rows = []
    for eid in range(400):
        rows.append((
            eid,
            T0 + timedelta(seconds=rng.randint(0, 3600 * 6)),
            rng.choice(["x", "y"]),
            round(rng.uniform(1, 100), 3),
        ))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {(r["event_type"], r["bucket"]): r for r in ohlc_bars(df).collect()}
    model: dict[tuple, list] = {}
    for eid, ts, k, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        model.setdefault((k, b), []).append((int(ts.timestamp()), eid % 10**6, v))
    for key, ticks in model.items():
        ticks.sort()
        r = got[key]
        assert r["open"] == pytest.approx(ticks[0][2])
        assert r["close"] == pytest.approx(ticks[-1][2])
        assert r["high"] == pytest.approx(max(t[2] for t in ticks))
        assert r["low"] == pytest.approx(min(t[2] for t in ticks))
        assert r["n"] == len(ticks)


def test_gini_distributed_equals_window(spark):
    from ai_etl_framework_spark.operators.stats import gini

    rng = random.Random(55)
    # FEW giant-ish groups with heavy ties — the distributed method's
    # target shape; equality must hold exactly (tie-invariant algebra)
    rows = [(f"g{i % 3}", float(rng.randint(0, 9))) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    win = {r["g"]: (r["n"], r["total"], r["gini"])
           for r in gini(df, "g", "v").collect()}
    dist = {r["g"]: (r["n"], r["total"], r["gini"])
            for r in gini(df, "g", "v", method="distributed").collect()}
    assert set(win) == set(dist)
    for g in win:
        assert win[g][0] == dist[g][0]
        assert dist[g][1] == pytest.approx(win[g][1], abs=1e-6)
        assert dist[g][2] == pytest.approx(win[g][2], abs=2e-6)
    with pytest.raises(ValueError, match="method"):
        gini(df, "g", "v", method="magic")


def test_quantile_normalize_distributed_equals_window(spark):
    from ai_etl_framework_spark.operators.scaling import quantile_normalize

    rng = random.Random(77)
    rows = [(i, f"g{i % 2}", float(rng.randint(0, 50))) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    win = {r["id"]: r["qn"] for r in quantile_normalize(
        df, "v", group_col="g"
    ).collect()}
    dist = {r["id"]: r["qn"] for r in quantile_normalize(
        df, "v", group_col="g", method="distributed"
    ).collect()}
    assert win == dist  # ties share quantiles -> exact equality
    # ungrouped distributed form (the global-sort case the window
    # method cannot scale): equals the global window result
    gw = {r["id"]: r["qn"] for r in quantile_normalize(df, "v").collect()}
    gd = {r["id"]: r["qn"] for r in quantile_normalize(
        df, "v", method="distributed"
    ).collect()}
    assert gw == gd
    # single-row group -> 0.0 on both paths
    one = spark.createDataFrame([(1, "a", 5.0)], "id long, g string, v double")
    assert quantile_normalize(one, "v", group_col="g").collect()[0]["qn"] == 0.0
    assert quantile_normalize(
        one, "v", group_col="g", method="distributed"
    ).collect()[0]["qn"] == 0.0
