"""r10 operator families (timeseries OHLC/TWAP, Welch A/B, seasonal
z, Gini, domain provenance, golden record, reconciliation, stratified
sampling, profile drift): pinned hand-computed values, NULL/edge
semantics, and validation errors. 3-SF oracle parity is x49–x58."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

T0 = datetime(2024, 1, 1, 10, 0, 0)


def ts(minutes, seconds=0):
    from datetime import timedelta

    return T0 + timedelta(minutes=minutes, seconds=seconds)


# -- ohlc ---------------------------------------------------------------


def test_ohlc_pinned(spark):
    from ai_etl_framework_spark.operators.timeseries import ohlc_bars

    rows = [
        # one hour bucket, out-of-order arrival: open=first by ts
        (1, ts(30), "a", 5.0),
        (2, ts(5), "a", 1.0),
        (3, ts(50), "a", 2.0),
        (4, ts(70), "a", 9.0),   # next hour
        (5, ts(10), None, 1.0),  # NULL key dropped
        (6, None, "a", 1.0),     # NULL ts dropped
        (7, ts(11), "a", None),  # NULL value dropped
        # same-second tie: event_id breaks it (8 before 9)
        (8, ts(0, 7), "b", 3.0),
        (9, ts(0, 7), "b", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["event_type"], r["bucket"].hour): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["n"]
        )
        for r in ohlc_bars(df).collect()
    }
    assert got[("a", 10)] == (1.0, 5.0, 1.0, 2.0, 8.0, 3)
    assert got[("a", 11)] == (9.0, 9.0, 9.0, 9.0, 9.0, 1)
    assert got[("b", 10)] == (3.0, 4.0, 3.0, 4.0, 7.0, 2)
    with pytest.raises(ValueError, match="bucket_unit"):
        ohlc_bars(df, bucket_unit="fortnight")


def test_twap_pinned(spark):
    from ai_etl_framework_spark.operators.timeseries import time_weighted_avg

    rows = [
        # value 10 held 60s, value 20 held 180s -> twap = (600+3600)/240
        (1, ts(0), "a", 10.0),
        (2, ts(1), "a", 20.0),
        (3, ts(4), "a", 99.0),   # last tick: no interval
        (4, ts(0), "b", 7.0),    # single tick: twap NULL
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        r["event_type"]: (r["twap"], r["simple_avg"], r["n"])
        for r in time_weighted_avg(df).collect()
    }
    assert got["a"] == (pytest.approx(17.5), 43.0, 3)
    assert got["b"] == (None, 7.0, 1)


# -- ab test ------------------------------------------------------------


def test_ab_test_matches_manual_welch(spark):
    import statistics as st

    from ai_etl_framework_spark.operators.abtest import ab_test

    ctrl = [10.0, 12.0, 11.0, 13.0, 9.0]
    var = [14.0, 15.0, 13.0, 16.0]
    rows = [("e1", "control", v) for v in ctrl] + [("e1", "t", v) for v in var]
    df = spark.createDataFrame(rows, "exp string, variant string, v double")
    r = ab_test(df, "exp", "variant", "v", control="control").collect()[0]
    m_c, m_v = st.mean(ctrl), st.mean(var)
    s2_c, s2_v = st.variance(ctrl), st.variance(var)
    se2 = s2_v / len(var) + s2_c / len(ctrl)
    t = (m_v - m_c) / se2 ** 0.5
    dof = se2 * se2 / (
        (s2_v / len(var)) ** 2 / (len(var) - 1)
        + (s2_c / len(ctrl)) ** 2 / (len(ctrl) - 1)
    )
    assert r["n_control"] == 5 and r["n_variant"] == 4
    assert r["lift"] == pytest.approx(round(m_v - m_c, 6), abs=1e-9)
    assert r["t_stat"] == pytest.approx(round(t, 6), abs=1e-9)
    assert r["dof"] == pytest.approx(round(dof, 6), abs=1e-9)
    assert r["significant"] == (abs(round(t, 6)) > 1.96)
    # degenerate arms: both variances zero -> NULL t/dof/significant
    const = [("e2", "control", 5.0)] * 3 + [("e2", "t", 6.0)] * 3
    df2 = spark.createDataFrame(const, "exp string, variant string, v double")
    r2 = ab_test(df2, "exp", "variant", "v", control="control").collect()[0]
    assert r2["t_stat"] is None and r2["dof"] is None
    assert r2["significant"] is None
    # single-observation arms are excluded
    tiny = [("e3", "control", 1.0), ("e3", "t", 2.0)]
    df3 = spark.createDataFrame(tiny, "exp string, variant string, v double")
    assert ab_test(df3, "exp", "variant", "v", control="control").count() == 0
    with pytest.raises(ValueError, match="z_crit"):
        ab_test(df, "exp", "variant", "v", control="control", z_crit=0)


# -- seasonal z ---------------------------------------------------------


def test_seasonal_zscore_pinned(spark):
    from ai_etl_framework_spark.operators.anomaly import seasonal_zscore

    # same hour-of-week bucket (Mondays 10:00): values 10,10,10,40
    from datetime import timedelta

    mon = datetime(2024, 1, 1, 10, 0, 0)  # 2024-01-01 is a Monday
    rows = [
        (i, mon + timedelta(weeks=i), "a", v)
        for i, v in enumerate([10.0, 10.0, 10.0, 40.0])
    ]
    # a different bucket with too few samples -> NULL sz
    rows.append((10, mon + timedelta(hours=3), "a", 5.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r["event_id"]: r for r in seasonal_zscore(
        df, key_col="event_type", threshold=2.0
    ).collect()}
    # mean 17.5, pop std sqrt(168.75) = 12.9904
    assert out[3]["sz"] == pytest.approx(round(22.5 / 168.75 ** 0.5, 6))
    assert out[3]["is_anomaly"] is False  # 1.73 < 2.0
    assert out[0]["sz"] == out[1]["sz"] == out[2]["sz"]
    assert out[10]["sz"] is None and out[10]["is_anomaly"] is None
    # buckets are hour-of-week: Monday 10:00 -> (2*24 + 10) Spark conv.
    assert out[0]["season_bucket"] == 2 * 24 + 10


# -- gini ---------------------------------------------------------------


def test_gini_pinned(spark):
    from ai_etl_framework_spark.operators.stats import gini

    rows = (
        [("eq", 5.0)] * 4                      # perfect equality -> 0
        + [("one", 0.0), ("one", 0.0), ("one", 9.0)]  # concentrated
        + [("zero", 0.0), ("zero", 0.0)]       # sum 0 -> NULL
        + [("eq", None), (None, 3.0)]          # dropped
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["n"], r["total"], r["gini"]) for r in gini(df, "g", "v").collect()}
    assert got["eq"] == (4, 20.0, 0.0)
    # sorted [0,0,9]: G = 2*27/(3*9) - 4/3 = 2 - 1.333333 = 0.666667
    assert got["one"] == (3, 9.0, pytest.approx(0.666667))
    assert got["zero"] == (2, 0.0, None)


# -- provenance ---------------------------------------------------------


def test_extract_domain_and_stats(spark):
    from ai_etl_framework_spark.operators.provenance import domain_stats

    rows = [
        (1, "https://www.Example.COM/path?q=1", "hello", "en"),
        (2, "HTTP://EXAMPLE.com:8080/x", "worlds", "de"),
        (3, "https://user:pw@sub.example.org/a", "abc", "en"),
        (4, "not a url", "x", "en"),
        (5, None, "y", "en"),
        (6, "ftp://files.example.net/f", "12345", None),
    ]
    df = spark.createDataFrame(rows, "id long, url string, text string, lang string")
    got = {r["domain"]: r for r in domain_stats(df).collect()}
    assert set(got) == {"example.com", "sub.example.org", "files.example.net"}
    ec = got["example.com"]
    assert ec["n_docs"] == 2 and ec["n_langs"] == 2
    assert ec["share"] == pytest.approx(0.5)          # 2 of 4 attributed
    assert ec["avg_chars"] == pytest.approx(5.5)      # hello/worlds
    assert ec["n_unattributed"] == 2                  # rows 4 and 5
    assert got["files.example.net"]["n_langs"] == 0   # NULL lang


# -- golden record ------------------------------------------------------


def test_golden_record_pinned(spark):
    from datetime import timedelta

    from ai_etl_framework_spark.operators.survivorship import golden_record

    d0 = T0
    rows = [
        # cluster 1: latest status by date = "B" (tie on date -> larger
        # value wins under max); mode city = "x" (2 vs 1); max amt 9
        (1, d0, "A", "x", 5.0),
        (1, d0 + timedelta(days=1), "B", "x", 9.0),
        (1, d0 + timedelta(days=1), "A", "y", 7.0),
        # cluster 2: all-NULL status -> NULL; mode tie alphabetical
        (2, d0, None, "m", 1.0),
        (2, d0 + timedelta(days=2), None, "k", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "c long, ts timestamp, status string, city string, amt double"
    )
    got = {
        r["c"]: (r["status"], r["city"], r["amt"], r["ts"])
        for r in golden_record(
            df,
            "c",
            {"status": "latest", "city": "mode", "amt": "max", "ts": "min"},
            order_col="ts",
        ).collect()
    }
    assert got[1] == ("B", "x", 9.0, d0)
    assert got[2] == (None, "k", 2.0, d0)
    with pytest.raises(ValueError, match="order_col"):
        golden_record(df, "c", {"status": "latest"})
    with pytest.raises(ValueError, match="unknown rule"):
        golden_record(df, "c", {"status": "newest"}, order_col="ts")
    with pytest.raises(ValueError, match="at least one"):
        golden_record(df, "c", {})
    # mode-only spec still yields a row per cluster
    mo = golden_record(df, "c", {"status": "mode"})
    assert {r["c"]: r["status"] for r in mo.collect()} == {1: "A", 2: None}


# -- reconcile ----------------------------------------------------------


def test_reconcile_pinned(spark):
    from ai_etl_framework_spark.operators.reconcile import (
        reconcile,
        reconcile_summary,
    )

    a = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0), (3, 1.0), (None, 9.0)],
        "k long, v double",
    )
    b = spark.createDataFrame(
        [(1, 15.0), (2, 7.0), (2, 0.0), (4, 2.0)], "k long, v double"
    )
    got = {r["k"]: (r["delta"], r["status"], r["n_a"], r["n_b"])
           for r in reconcile(a, b, "k", "v").collect()}
    # key 1: sums match but row counts differ -> mismatch
    assert got[1] == (0.0, "mismatch", 2, 1)
    assert got[2] == (0.0, "mismatch", 1, 2)
    assert got[3] == (1.0, "a_only", 1, None)
    assert got[4] == (-2.0, "b_only", None, 1)
    assert None not in got  # NULL keys dropped
    summ = {r["status"]: (r["n_keys"], r["total_abs_delta"])
            for r in reconcile_summary(a, b, "k", "v").collect()}
    assert summ["a_only"] == (1, 1.0)
    assert summ["b_only"] == (1, 2.0)
    assert summ["mismatch"] == (2, 0.0)
    with pytest.raises(ValueError, match="key"):
        reconcile(a, b, [], "v")


# -- stratified sample --------------------------------------------------


def test_stratified_sample_semantics(spark):
    from ai_etl_framework_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    rows = [(i, "s%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample(
        df, "s", {"s0": 1.0, "s1": 0.5}, "id", salt="t", default=0.0
    )
    by = {s: n for s, n in out.groupBy("s").count().collect()}
    assert by.get("s0") == 100            # fraction 1.0 keeps all
    assert by.get("s2") is None           # default 0.0 drops
    assert 25 <= by.get("s1", 0) <= 75    # ~half
    # per-stratum membership == plain deterministic_sample at the same
    # fraction/salt (the strata only SELECT the fraction)
    s1 = {r["id"] for r in out.where(F.col("s") == "s1").collect()}
    ref = {
        r["id"]
        for r in deterministic_sample(
            df.where(F.col("s") == "s1"), "id", 0.5, salt="t"
        ).collect()
    }
    assert s1 == ref
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "s", {"s0": 1.5}, "id")
    with pytest.raises(ValueError, match="at least one"):
        stratified_sample(df, "s", {}, "id")


# -- profile drift ------------------------------------------------------


def test_profile_drift_pinned(spark):
    from ai_etl_framework_spark.operators.drift import profile_drift

    a = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, None, "x")],
        "id long, v double, c string",
    )
    b = spark.createDataFrame(
        [(1, 40.0, "x"), (2, None, None)], "id long, v double, c string"
    )
    rows = {r["column"]: r for r in profile_drift(
        a, b, numeric_cols=["v"], categorical_cols=["c"]
    ).collect()}
    v = rows["v"]
    assert v["kind"] == "numeric"
    assert v["null_rate_a"] == pytest.approx(round(1 / 3, 6))
    assert v["null_rate_b"] == 0.5
    assert v["n_distinct_a"] == 2 and v["n_distinct_b"] == 1
    assert v["mean_a"] == 15.0 and v["mean_b"] == 40.0
    assert v["mean_delta"] == 25.0
    c = rows["c"]
    assert c["kind"] == "categorical"
    assert c["mean_a"] is None and c["mean_delta"] is None
    assert c["n_distinct_a"] == 2 and c["n_distinct_b"] == 1
    with pytest.raises(ValueError, match="at least one"):
        profile_drift(a, b)
    with pytest.raises(ValueError, match="both"):
        profile_drift(a, b, numeric_cols=["v"], categorical_cols=["v"])


# -- weighted sample ------------------------------------------------


def test_weighted_sample_semantics(spark):
    from ai_etl_framework_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 if i < 500 else 100.0) for i in range(600)]
    rows += [(900, None), (901, 0.0), (902, -3.0)]  # no selection mass
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "w", 80, "id", salt="t").collect()
    assert len(got) == 80
    ids = {r["id"] for r in got}
    assert not ids & {900, 901, 902}
    # heavy-weight items dominate: 100 heavy ids vs 500 light at 100x
    heavy = sum(1 for i in ids if i >= 500)
    assert heavy > 60
    # deterministic across calls and independent of partitioning
    again = {r["id"] for r in weighted_sample(
        df.repartition(7), "w", 80, "id", salt="t"
    ).collect()}
    assert again == ids
    with pytest.raises(ValueError, match="n must"):
        weighted_sample(df, "w", 0, "id")


# -- quantile normalize ----------------------------------------------


def test_quantile_normalize_pinned(spark):
    from ai_etl_framework_spark.operators.scaling import quantile_normalize

    rows = [("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0),
            ("b", 7.0), ("a", None), (None, 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, "v", group_col="g")
    got = sorted(
        (r["g"], r["v"], r["qn"]) for r in out.collect()
    )
    # ranks in a: 10->0, 20/20 tie -> 1/3, 30 -> 1; b single row -> 0
    assert got == [
        ("a", 10.0, 0.0),
        ("a", 20.0, pytest.approx(round(1 / 3, 6))),
        ("a", 20.0, pytest.approx(round(1 / 3, 6))),
        ("a", 30.0, 1.0),
        ("b", 7.0, 0.0),
    ]


# -- burst detection --------------------------------------------------


def test_burst_detection_pinned(spark):
    from datetime import timedelta

    from ai_etl_framework_spark.operators.timeseries import burst_detection

    rows = []
    eid = 0
    # key a: 4 calm hours of 2 events, then an hour with 10
    for h, n in enumerate([2, 2, 2, 2, 10]):
        for _ in range(n):
            rows.append((eid, T0 + timedelta(hours=h), "a"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["bucket"].hour: r for r in burst_detection(
        df, "event_type", "ts", "hour", trailing=6, factor=3.0,
        min_baseline_buckets=3,
    ).collect()}
    assert out[10]["ratio"] is None          # no baseline yet
    assert out[12]["ratio"] is None          # only 2 preceding buckets
    assert out[13]["ratio"] == 1.0 and out[13]["is_burst"] is False
    assert out[14]["ratio"] == 5.0 and out[14]["is_burst"] is True
    assert out[14]["baseline"] == 2.0
    with pytest.raises(ValueError, match="trailing"):
        burst_detection(df, trailing=0)


# -- embedding label stats ---------------------------------------------


def test_embedding_label_stats_pinned(spark):
    from ai_etl_framework_spark.operators.embstats import (
        embedding_label_stats,
    )

    rows = [
        (1, [3.0, 4.0]),   # norm 5
        (1, [0.0, 0.0]),   # norm 0
        (2, [1.0, 0.0, 2.0]),
        (None, [9.9]),     # NULL label dropped
        (3, None),         # NULL vector dropped
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = {(r["label"], r["pos"]): r for r in embedding_label_stats(df).collect()}
    assert set(got) == {(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)}
    r = got[(1, 1)]
    assert r["centroid"] == 1.5 and r["n"] == 2
    assert r["avg_norm"] == 2.5 and r["sd_norm"] == 2.5  # pop std of {5,0}
    assert got[(1, 2)]["centroid"] == 2.0
    assert got[(2, 3)]["centroid"] == 2.0 and got[(2, 3)]["n"] == 1


# -- attribution --------------------------------------------------------


def test_attribution_pinned(spark):
    from datetime import timedelta

    from ai_etl_framework_spark.operators.attribution import attribution

    rows = [
        # user 1: view@0, click@10, purchase@20 (last touch = click),
        # purchase@5 (last touch = view)
        (1, 1, T0, "view", 0.0),
        (2, 1, T0 + timedelta(minutes=10), "click", 0.0),
        (3, 1, T0 + timedelta(minutes=20), "purchase", 50.0),
        (4, 1, T0 + timedelta(minutes=5), "purchase", 10.0),
        # user 2: purchase with NO preceding touch -> (none)
        (5, 2, T0, "purchase", 7.0),
        (6, 2, T0 + timedelta(minutes=1), "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double",
    )
    last = {r["channel"]: (r["n_conversions"], r["attributed_value"])
            for r in attribution(df, ["purchase"], ["view", "click"]).collect()}
    assert last == {"click": (1, 50.0), "view": (1, 10.0), "(none)": (1, 7.0)}
    first = {r["channel"]: (r["n_conversions"], r["attributed_value"])
             for r in attribution(
                 df, ["purchase"], ["view", "click"], mode="first"
             ).collect()}
    # user 1's first touch (view@0) precedes both purchases
    assert first == {"view": (2, 60.0), "(none)": (1, 7.0)}
    with pytest.raises(ValueError, match="mode"):
        attribution(df, ["purchase"], ["view"], mode="linear")
    with pytest.raises(ValueError, match="at least one"):
        attribution(df, [], ["view"])


# -- date dim -----------------------------------------------------------


def test_date_dim_pinned(spark):
    from ai_etl_framework_spark.operators.calendar import date_dim

    out = {str(r["date"]): r for r in date_dim(
        spark, "2024-01-28", "2024-02-03"
    ).collect()}
    assert len(out) == 7  # inclusive span
    jan31 = out["2024-01-31"]
    assert jan31["is_month_end"] is True and jan31["month"] == 1
    feb1 = out["2024-02-01"]
    assert feb1["is_month_start"] is True and feb1["quarter"] == 1
    sun = out["2024-01-28"]  # a Sunday
    assert sun["dow"] == 1 and sun["is_weekend"] is True
    mon = out["2024-01-29"]
    assert mon["dow"] == 2 and mon["is_weekend"] is False
    assert mon["iso_week"] == 5
    with pytest.raises(ValueError, match="after end"):
        date_dim(spark, "2024-02-01", "2024-01-01")
    with pytest.raises(ValueError, match="ISO"):
        date_dim(spark, "02/01/2024", "2024-03-01")


# -- pmi collocations ----------------------------------------------------


def test_pmi_pinned(spark):
    import math

    from ai_etl_framework_spark.operators.collocations import (
        pmi_collocations,
    )

    # "new york" always adjacent; "the cat" vs "the dog" split
    docs = (
        ["new york is big"] * 5
        + ["the cat sat", "the dog sat", "the cat ran", "a b"] * 3
    )
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
           for r in pmi_collocations(df, min_count=3, top_k=50).collect()}
    # totals: tokens and bigrams counted over ALL docs
    n_tok = sum(len(t.split()) for t in docs)
    n_bi = sum(len(t.split()) - 1 for t in docs)
    c_new = 5
    c_york = 5
    exp = math.log((5 / n_bi) / ((c_new / n_tok) * (c_york / n_tok)))
    assert out[("new", "york")] == (5, pytest.approx(round(exp, 6)))
    # bigrams never cross documents: ("big", "new") from doc joins absent
    assert ("big", "new") not in out
    # min_count prunes: ("the","dog") has 3, kept; ("dog","sat") has 3
    assert ("the", "cat") in out and out[("the", "cat")][0] == 6
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, min_count=0)


# -- readability ----------------------------------------------------------


def test_readability_pinned(spark):
    from ai_etl_framework_spark.operators.textstats import readability

    rows = [
        (1, "The cat sat on the mat. It was happy!"),
        (2, "word"),
        (3, None),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = got[1]
    assert r1["words"] == 9 and r1["sentences"] == 2
    # vowel groups: the(1) cat(1) sat(1) on(1) the(1) mat(1) it(1)
    # was(1) happy(2: a, y) = 10
    assert r1["syllables"] == 10
    exp = 206.835 - 1.015 * (9 / 2) - 84.6 * (10 / 9)
    assert r1["flesch"] == pytest.approx(round(exp, 4))
    # unterminated single word: one sentence
    assert got[2]["sentences"] == 1 and got[2]["words"] == 1
    # empty docs: zero words, NULL everything else
    for d in (3, 4):
        assert got[d]["words"] == 0
        assert got[d]["sentences"] is None and got[d]["flesch"] is None


# -- seasonal naive eval ----------------------------------------------------


def test_seasonal_naive_eval_pinned(spark):
    from datetime import timedelta

    from ai_etl_framework_spark.operators.timeseries import (
        seasonal_naive_eval,
    )

    rows = []
    eid = 0
    # week 1: hours 0,1 with means 10, 20; week 2 same hours: 12, 18
    for week, vals in ((0, [10.0, 20.0]), (1, [12.0, 18.0])):
        for h, v in enumerate(vals):
            rows.append((eid, T0 + timedelta(days=7 * week, hours=h), "a", v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    r = seasonal_naive_eval(df, season="7 days").collect()[0]
    assert r["n_buckets"] == 4 and r["n_scored"] == 2
    # errs: 12-10=2, 18-20=-2 -> mae 2, bias 0, mape (2/12 + 2/18)/2
    assert r["mae"] == 2.0 and r["bias"] == 0.0
    assert r["mape"] == pytest.approx(round((2 / 12 + 2 / 18) / 2, 6))
    with pytest.raises(ValueError, match="bucket_unit"):
        seasonal_naive_eval(df, bucket_unit="epoch")


# -- join size estimate ------------------------------------------------------


def test_join_size_estimate_pinned(spark):
    from ai_etl_framework_spark.operators.audit import (
        join_cardinality_estimate,
    )

    fact = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k long"
    )
    dim = spark.createDataFrame([(1,), (1,), (2,), (9,)], "d long")
    r = join_cardinality_estimate(fact, dim, "k", "d").collect()[0]
    assert r["n_fact"] == 5 and r["n_dim"] == 4       # NULL key excluded
    assert r["keys_fact"] == 3 and r["keys_dim"] == 3
    assert r["matched_keys"] == 2
    # key 1: 3*2=6, key 2: 1*1=1 -> 7 exact output rows
    assert r["est_join_rows"] == 7
    assert r["max_per_key_fact"] == 3 and r["max_per_key_dim"] == 2
    # truth check against the actual join
    actual = fact.join(dim, fact["k"] == dim["d"]).count()
    assert actual == r["est_join_rows"]


# -- session stats -------------------------------------------------------


def test_session_stats_pinned(spark):
    from datetime import timedelta

    from ai_etl_framework_spark.streaming.sessions import session_stats_batch

    sun = datetime(2024, 1, 7, 10, 0, 0)  # a Sunday
    rows = [
        # user 1, Sunday: 3-event session spanning 10 min, value 6
        (1, 1, sun, 1.0), (2, 1, sun + timedelta(minutes=5), 2.0),
        (3, 1, sun + timedelta(minutes=10), 3.0),
        # user 1, Sunday: bounce 2h later
        (4, 1, sun + timedelta(hours=2), 10.0),
        # user 2, Monday: bounce
        (5, 2, sun + timedelta(days=1), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {r["dow"]: r for r in session_stats_batch(df, gap_minutes=30).collect()}
    sunr = got[1]  # Spark dow: Sunday = 1
    assert sunr["n_sessions"] == 2
    assert sunr["bounce_rate"] == 0.5
    assert sunr["avg_duration_sec"] == 300.0  # (600 + 0) / 2
    assert sunr["avg_events"] == 2.0
    assert sunr["total_value"] == 16.0
    mon = got[2]
    assert mon["n_sessions"] == 1 and mon["bounce_rate"] == 1.0
    with pytest.raises(ValueError, match="by must"):
        session_stats_batch(df, by="minute")


# -- heatmap bins ---------------------------------------------------------


def test_heatmap_bins_pinned(spark):
    from ai_etl_framework_spark.operators.viz_prep import heatmap_bins

    rows = [
        (0.0, 0.0), (10.0, 100.0),      # corners
        (5.0, 50.0), (5.1, 50.0),       # middle cell
        (None, 1.0), (1.0, float("nan")),  # dropped
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {(r["x_bin"], r["y_bin"]): r["count"]
           for r in heatmap_bins(df, "x", "y", 2, 2).collect()}
    # bounds x:[0,10] y:[0,100]; max folds into last bin; the exact
    # midpoints (5.0, 50.0) land in the UPPER bin (floor(0.5*2)+1 = 2)
    assert got[(1, 1)] == 1 and got[(2, 2)] == 3
    assert sum(got.values()) == 4
    # degenerate y axis collapses to one y bin
    d2 = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], "x double, y double")
    got2 = {(r["x_bin"], r["y_bin"]) for r in heatmap_bins(d2, "x", "y", 2, 2).collect()}
    assert got2 == {(1, 1), (2, 1)}
    with pytest.raises(ValueError, match="bins"):
        heatmap_bins(df, "x", "y", 0, 2)


# -- versioned diff --------------------------------------------------------


def test_versioned_table_diff(spark, tmp_path):
    from ai_etl_framework_spark.sinks.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    ))
    t.commit(spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    ))
    got = {r["doc_id"]: r["status"] for r in t.diff(1, 2).collect()}
    assert got == {2: "modified", 3: "removed", 4: "added"}
    # default to_version = latest; include_unchanged keeps row 1
    all_rows = {r["doc_id"]: r["status"]
                for r in t.diff(1, include_unchanged=True).collect()}
    assert all_rows[1] == "unchanged"


# -- entity resolution composition ----------------------------------------


def test_entity_resolution_composition(spark):
    """The examples/entity_resolution.py loop end to end on a frame
    with known near-duplicate clusters: fuzzy pairs -> connected
    components -> golden record."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.entity_resolution import resolve_entities

    rows = [
        # cluster: acme corp / acme corp. / acme cor (chain, dist<=1)
        (1, "acme corp", "AUTO", 10.0),
        (2, "acme corp.", "AUTO", 30.0),
        (3, "acme cor", "RETAIL", 20.0),
        # cluster: zenith labs / zenith lab
        (10, "zenith labs", "MACH", 5.0),
        (11, "zenith lab", "MACH", 7.0),
        # singleton
        (20, "wholly unique industries", "FURN", 1.0),
    ]
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_mktsegment string, c_acctbal double"
    )
    golden, n = resolve_entities(cust)
    got = {r["entity_id"]: (r["c_name"], r["c_mktsegment"], r["c_acctbal"])
           for r in golden.collect()}
    assert n == 3
    assert got[1] == ("acme cor", "AUTO", 30.0)       # min name, modal seg, max bal
    assert got[10] == ("zenith lab", "MACH", 7.0)
    assert got[20] == ("wholly unique industries", "FURN", 1.0)


# -- novelty ----------------------------------------------------------------


def test_novelty_pinned(spark):
    from ai_etl_framework_spark.operators.novelty import novelty_scores

    docs = [
        (1, "a b c d"),          # shingles {a b c, b c d}
        (2, "a b c e"),          # shares "a b c" with doc 1
        (3, "x y z w"),          # fully unique
        (4, ""),                 # no shingles
        (5, None),               # no shingles
        (6, "q r"),              # short doc -> one whole-doc shingle
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in novelty_scores(df, k=3).collect()}
    import math

    # doc 1: "a b c" df=2, "b c d" df=1 -> novelty 0.5
    assert got[1]["n_shingles"] == 2
    assert got[1]["novelty"] == 0.5
    assert got[1]["mean_log_df"] == pytest.approx(
        round((math.log(2) + math.log(1)) / 2, 6)
    )
    assert got[3]["novelty"] == 1.0 and got[3]["mean_log_df"] == 0.0
    for d in (4, 5):
        assert got[d]["n_shingles"] == 0 and got[d]["novelty"] is None
    assert got[6]["n_shingles"] == 1 and got[6]["novelty"] == 1.0
    with pytest.raises(ValueError, match="k must"):
        novelty_scores(df, k=0)


# -- rolling correlation -----------------------------------------------------


def test_rolling_corr_matches_numpy(spark):
    from datetime import timedelta

    import numpy as np

    from ai_etl_framework_spark.operators.timeseries import rolling_corr

    rng = __import__("random").Random(3)
    rows = []
    xs, ys = [], []
    for d in range(20):
        x = rng.uniform(0, 10)
        y = 2 * x + rng.uniform(-1, 1)
        xs.append(x)
        ys.append(y)
        # two raw rows per day so the bucket MEAN matters
        rows.append((T0 + timedelta(days=d), "k", x - 1.0, y + 2.0))
        rows.append((T0 + timedelta(days=d), "k", x + 1.0, y - 2.0))
    df = spark.createDataFrame(
        rows, "ts timestamp, g string, xv double, yv double"
    )
    out = sorted(
        rolling_corr(
            df, "xv", "yv", ts_col="ts", key_col="g",
            bucket_unit="day", window=7, min_periods=4,
        ).collect(),
        key=lambda r: r["bucket"],
    )
    for i, r in enumerate(out):
        assert r["x_mean"] == pytest.approx(round(xs[i], 6), abs=1e-6)
        lo = max(0, i - 6)
        if i - lo + 1 < 4:
            assert r["rolling_corr"] is None
        else:
            model = float(np.corrcoef(xs[lo:i + 1], ys[lo:i + 1])[0, 1])
            assert r["rolling_corr"] == pytest.approx(model, abs=2e-6)
    with pytest.raises(ValueError, match="window"):
        rolling_corr(df, "xv", "yv", window=1)


# -- evaluation reports ------------------------------------------------------


def test_classification_report_pinned(spark):
    from ai_etl_framework_spark.operators.evaluation import (
        classification_report,
    )

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),   # a: tp2 fn1
        ("b", "b"), ("b", "a"),               # b: tp1 fn1; a gets fp1
        ("c", "a"),                           # c never predicted
        (None, "a"), ("a", None),             # dropped
    ]
    df = spark.createDataFrame(rows, "y string, p string")
    got = {r["class"]: r for r in classification_report(df, "y", "p").collect()}
    a = got["a"]
    assert (a["tp"], a["fp"], a["fn"]) == (2, 2, 1)
    assert a["precision"] == 0.5 and a["recall"] == pytest.approx(
        round(2 / 3, 6)
    )
    assert a["f1"] == pytest.approx(round(2 * 0.5 * (2 / 3) / (0.5 + 2 / 3), 6))
    c = got["c"]
    assert c["n_pred"] == 0 and c["precision"] is None  # 0-division -> NULL
    assert c["recall"] == 0.0 and c["f1"] is None
    # micro accuracy = 3 correct of 6 scored rows, on every row
    assert all(r["accuracy"] == 0.5 for r in got.values())


def test_regression_report_matches_numpy(spark):
    import numpy as np

    from ai_etl_framework_spark.operators.evaluation import regression_report

    rng = __import__("random").Random(17)
    actual = [rng.uniform(0, 100) for _ in range(200)]
    pred = [a + rng.gauss(0, 5) for a in actual]
    df = spark.createDataFrame(list(zip(actual, pred)), "a double, p double")
    r = regression_report(df, "a", "p").collect()[0]
    a, p = np.asarray(actual), np.asarray(pred)
    err = a - p
    assert r["n"] == 200
    assert r["mae"] == pytest.approx(round(float(np.abs(err).mean()), 6), abs=1e-6)
    assert r["rmse"] == pytest.approx(round(float(np.sqrt((err ** 2).mean())), 6), abs=1e-6)
    r2 = 1 - float((err ** 2).sum()) / float(((a - a.mean()) ** 2).sum())
    assert r["r2"] == pytest.approx(r2, abs=1e-5)
    assert r["bias"] == pytest.approx(round(float(err.mean()), 6), abs=1e-6)
    # constant actual -> r2 NULL
    const = spark.createDataFrame([(5.0, 4.0), (5.0, 6.0)], "a double, p double")
    assert regression_report(const, "a", "p").collect()[0]["r2"] is None


def test_ndcg_pinned(spark):
    import math

    from ai_etl_framework_spark.operators.evaluation import ndcg_at_k

    rows = [
        # query q1: system order by score = d1(rel2), d2(rel0), d3(rel1)
        ("q1", 1, 9.0, 2), ("q1", 2, 8.0, 0), ("q1", 3, 7.0, 1),
        # query q2: no relevant docs -> NULL
        ("q2", 4, 5.0, 0), ("q2", 5, 4.0, 0),
    ]
    df = spark.createDataFrame(rows, "q string, id long, score double, rel int")
    got = {r["q"]: r for r in ndcg_at_k(df, "q", "id", "score", "rel", k=10).collect()}
    dcg = 2 / math.log2(2) + 0 / math.log2(3) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3) + 0 / math.log2(4)
    assert got["q1"]["ndcg"] == pytest.approx(round(dcg / idcg, 6))
    assert got["q2"]["ndcg"] is None and got["q2"]["n_docs"] == 2
    # perfect ranking -> 1.0
    perf = spark.createDataFrame(
        [("q", 1, 3.0, 2), ("q", 2, 2.0, 1), ("q", 3, 1.0, 0)],
        "q string, id long, score double, rel int",
    )
    assert ndcg_at_k(perf, "q", "id", "score", "rel").collect()[0]["ndcg"] == 1.0
    with pytest.raises(ValueError, match="k must"):
        ndcg_at_k(df, "q", "id", "score", "rel", k=0)
