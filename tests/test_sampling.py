"""Deterministic sampling / splitting / mixture / packing.

The hash-membership ops are verified against DuckDB running the
equivalent SQL on the same parquet (same md5-prefix arithmetic) — the
engine-portability claim is the whole point of hash determinism."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    hash_uniform,
    pack_documents,
    stratified_quota,
    weighted_mixture,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    return con


def test_deterministic_sample_matches_duckdb(docs, sf_dir):
    got = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs, "doc_id", 0.25, salt="s1").collect()
    )
    want = [
        r[0]
        for r in _duck(sf_dir).execute(
            "SELECT doc_id FROM documents WHERE "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 8))::BIGINT"
            " / 4294967296.0 < 0.25 ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want and len(got) > 0
    # ≈fraction within sampling noise on 500 docs
    assert 0.15 < len(got) / docs.count() < 0.35


def test_sample_stable_under_repartition(docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.3).collect()
    }
    assert a == b, "membership must not depend on physical partitioning"


def test_sample_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    large = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.4).collect()}
    assert small <= large, "10% sample must be a subset of the 40% sample"


def test_hash_split_disjoint_exhaustive_and_duckdb_parity(docs, sf_dir):
    out = hash_split(docs, "doc_id", (0.6, 0.2, 0.2), names=("train", "val", "test"))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count(), "exhaustive"
    got_test = sorted(
        r["doc_id"] for r in out.where(F.col("split") == "test").collect()
    )
    want_test = [
        r[0]
        for r in _duck(sf_dir).execute(
            "SELECT doc_id FROM documents WHERE "
            "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
            " / 4294967296.0 >= 0.8 ORDER BY doc_id"
        ).fetchall()
    ]
    assert got_test == want_test
    assert counts["train"] > counts["val"]  # 0.6 vs 0.2 at n=500


def test_stratified_quota_caps_every_class(docs):
    out = stratified_quota(docs, "lang", "doc_id", quota=30)
    per = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    orig = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in per:
        assert r["n"] == min(30, orig[r["lang"]])
    # deterministic: same survivors twice
    again = stratified_quota(docs, "lang", "doc_id", quota=30)
    assert {x["doc_id"] for x in out.collect()} == {x["doc_id"] for x in again.collect()}


def test_weighted_mixture_proportions_and_tagging(spark):
    a = spark.range(1000).select(F.col("id"), F.lit("A").alias("payload"))
    b = spark.range(4000, 4500).select(F.col("id"), F.lit("B").alias("payload"))
    out = weighted_mixture(
        {"big": a, "small": b}, {"big": 3.0, "small": 1.0}, "id"
    )
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # big binds: C = min(1000/0.75, 500/0.25) = 1333 → big taken whole,
    # small thinned to ≈ 333 for a 3:1 mixture
    assert counts["big"] == 1000
    assert 280 < counts["small"] < 390
    assert set(out.columns) == {"id", "payload", "source"}
    ratio = counts["big"] / counts["small"]
    assert 2.5 < ratio < 3.6


def test_weighted_mixture_aligns_disjoint_schemas(spark):
    a = spark.range(100).select(F.col("id"), F.lit("x").alias("only_a"))
    b = spark.range(100).select(F.col("id"), F.lit(7).alias("only_b"))
    out = weighted_mixture({"a": a, "b": b}, {"a": 1.0, "b": 1.0}, "id")
    assert set(out.columns) == {"id", "only_a", "only_b", "source"}
    row_b = out.where(F.col("source") == "b").first()
    assert row_b["only_a"] is None and row_b["only_b"] == 7


def test_pack_documents_invariants(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.randint(50, 900)) for i in range(2000)] + [(9999, 5000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_documents(df, "doc_id", "n_tokens", max_tokens=2048, num_buckets=8).cache()
    assert out.count() == 2001, "every document packed exactly once"
    packs = out.groupBy("pack_id").agg(
        F.sum("tokens").alias("t"), F.count("*").alias("c"),
        F.first("pack_tokens").alias("pt"), F.first("pack_size").alias("ps"),
    )
    over = packs.where((F.col("t") > 2048) & (F.col("c") > 1)).count()
    assert over == 0, "multi-doc packs never exceed the cap"
    bad = packs.where((F.col("t") != F.col("pt")) | (F.col("c") != F.col("ps"))).count()
    assert bad == 0, "pack_tokens/pack_size annotations are consistent"
    # the oversized single doc gets a solo pack
    solo = out.where(F.col("id") == 9999).first()
    assert solo["pack_size"] == 1 and solo["pack_tokens"] == 5000
    # efficiency: average multi-pack fill ≥ 70% of capacity (greedy on
    # 50-900 token docs packs tightly)
    avg_fill = packs.where(F.col("c") > 1).agg(F.avg("t")).first()[0]
    assert avg_fill > 0.7 * 2048
    # deterministic under repartitioning
    again = pack_documents(
        df.repartition(13), "doc_id", "n_tokens", max_tokens=2048, num_buckets=8
    )
    assert sorted(map(tuple, out.select("id", "pack_id").collect())) == sorted(
        map(tuple, again.select("id", "pack_id").collect())
    )
    out.unpersist()


def test_pack_documents_matches_greedy_model(spark):
    """Single bucket vs a literal pandas greedy model — the kernel is
    exactly first-fit-in-hash-order."""
    import hashlib

    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_documents(df, "doc_id", "n_tokens", max_tokens=1000, num_buckets=1)
    got = {r["id"]: r["pack_id"] for r in out.collect()}
    ordered = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    want, fill, seq = {}, 0, -1
    for i, t in ordered:
        if seq < 0 or fill + t > 1000:
            seq += 1
            fill = 0
        fill += t
        want[i] = seq
    assert got == want


def test_invalid_args():
    with pytest.raises(ValueError):
        deterministic_sample(None, "id", 1.5)
    with pytest.raises(ValueError):
        hash_split(None, "id", (0.5, 0.2))
    with pytest.raises(ValueError):
        weighted_mixture({"a": None}, {"b": 1.0}, "id")


def test_shuffle_deterministic_is_stable_permutation(docs):
    from ai_etl_framework_spark.operators.sampling import shuffle_deterministic

    a = [r["doc_id"] for r in shuffle_deterministic(docs, "doc_id", "e1").collect()]
    b = [
        r["doc_id"]
        for r in shuffle_deterministic(docs.repartition(7), "doc_id", "e1").collect()
    ]
    assert a == b  # same salt -> same order, regardless of partitioning
    assert sorted(a) == sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    c = [r["doc_id"] for r in shuffle_deterministic(docs, "doc_id", "e2").collect()]
    assert a != c  # new salt -> new permutation
    assert sorted(a) == sorted(c)


def test_upsample_copies_and_determinism(spark):
    from ai_etl_framework_spark.operators.sampling import upsample

    df = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    up = upsample(df, 2.5, "doc_id", salt="ep0")
    rows = up.groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in rows}
    assert set(counts.values()) <= {2, 3}
    # fractional part lands near 0.5 in expectation
    n3 = sum(1 for v in counts.values() if v == 3)
    assert 120 <= n3 <= 280
    # reproducible: second run identical
    again = {
        r["doc_id"]: r["count"]
        for r in upsample(df, 2.5, "doc_id", salt="ep0").groupBy("doc_id").count().collect()
    }
    assert counts == again
    # copy_idx numbers copies 1..n
    one = upsample(df.where(F.col("doc_id") == 0), 3.0, "doc_id")
    assert sorted(r["copy_idx"] for r in one.collect()) == [1, 2, 3]


def test_upsample_zero_and_subunit_weights(spark):
    from ai_etl_framework_spark.operators.sampling import upsample

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    assert upsample(df, 0.0, "doc_id").count() == 0
    kept = upsample(df, 0.3, "doc_id", salt="s")
    n = kept.count()
    assert 200 <= n <= 400  # ≈0.3 of 1000, hash-decided
    assert kept.select(F.max("copy_idx")).collect()[0][0] == 1


def test_null_ids_sample_and_split_deterministically(spark):
    """r4 review: NULL ids must not vanish from a 100% sample (NULL
    hash < 1.0 is never true) nor all silently land in the last
    split; they hash as one sentinel value — all-or-none, one split."""
    from ai_etl_framework_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
    )

    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), (None,)], "id string"
    )
    assert deterministic_sample(df, "id", 1.0).count() == 4
    assert deterministic_sample(df, "id", 0.0).count() == 0
    splits = hash_split(df, "id", (0.5, 0.5), names=("x", "y"))
    null_splits = {
        r["split"] for r in splits.where(F.col("id").isNull()).collect()
    }
    assert len(null_splits) == 1  # all NULL ids in ONE deterministic split


def test_pack_documents_excludes_null_token_counts(spark):
    """r4 review: NULL token counts arrive in the Arrow kernel as NaN
    and killed the task via int(NaN); they are now excluded up front."""
    from ai_etl_framework_spark.operators.sampling import pack_documents

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc long, tokens int"
    )
    out = pack_documents(df, "doc", "tokens", max_tokens=16, num_buckets=2)
    ids = {r["id"] for r in out.collect()}
    assert ids == {1, 3}


def test_null_id_duckdb_twin_parity(spark):
    """r4 review: the documented DuckDB twin (and _SMP01_SQL) must use
    the same '\\x00' sentinel for NULL ids — a bare md5(NULL) NULL-
    propagates, silently dropping NULL-id rows from every sample and
    dumping them into the last split range while Spark buckets them."""
    from ai_etl_framework_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(20)] + [(None,), (None,)], "id int"
    )
    sampled = sorted(
        r["id"] for r in deterministic_sample(df, "id", 0.5, salt="s").collect()
        if r["id"] is not None
    )
    null_in = any(
        r["id"] is None
        for r in deterministic_sample(df, "id", 0.5, salt="s").collect()
    )
    split_of_null = {
        r["split"] for r in hash_split(df, "id", (0.5, 0.5), names=("a", "b"))
        .where(F.col("id").isNull()).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i})" for i in range(20))
        + ", (NULL), (NULL)) v(id)"
    )
    u = ("('0x' || substr(md5(COALESCE(CAST(id AS VARCHAR), chr(0)) || 's'), 1, 8))::BIGINT"
         " / 4294967296.0")
    duck_sampled = sorted(
        r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {u} < 0.5 AND id IS NOT NULL"
        ).fetchall()
    )
    duck_null_in = con.execute(
        f"SELECT count(*) FROM t WHERE {u} < 0.5 AND id IS NULL"
    ).fetchone()[0] > 0
    u0 = ("('0x' || substr(md5(COALESCE(CAST(id AS VARCHAR), chr(0))), 1, 8))::BIGINT"
          " / 4294967296.0")
    duck_split_null = {
        r[0] for r in con.execute(
            f"SELECT CASE WHEN {u0} < 0.5 THEN 'a' ELSE 'b' END FROM t WHERE id IS NULL"
        ).fetchall()
    }
    assert sampled == duck_sampled
    assert null_in == duck_null_in
    assert split_of_null == duck_split_null


def test_pack_documents_excludes_null_ids(spark):
    """r5: a NULL id hashes to a NULL bucket, which used to reach the
    pandas kernel as NaN and kill the task (int(NaN)). NULL-id docs
    are excluded like NULL-token docs — documented, not a crash."""
    from pyspark.sql import functions as F

    from ai_etl_framework_spark.operators.sampling import pack_documents

    df = spark.createDataFrame(
        [(1, 100), (None, 100), (2, 100), (3, None)],
        "doc_id long, n long",
    )
    out = pack_documents(df, "doc_id", "n", 4096, num_buckets=4)
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [1, 2]


def test_temperature_weights_mixture(spark):
    """mT5 temperature sampling pins: alpha=1 is size-proportional,
    alpha=0 is uniform over non-empty sources, alpha=0.3 boosts the
    low-resource source relative to proportional; composing with
    weighted_mixture yields a deterministic mixture at the smoothed
    proportions; guards raise."""
    import pytest as _pytest

    from ai_etl_framework_spark.operators.sampling import (
        temperature_weights,
        weighted_mixture,
    )

    sizes = {"big": 8000, "small": 1000}
    w1 = temperature_weights(sizes, alpha=1.0)
    assert abs(w1["big"] - 8 / 9) < 1e-12
    w0 = temperature_weights(sizes, alpha=0.0)
    assert w0 == {"big": 0.5, "small": 0.5}
    w = temperature_weights(sizes, alpha=0.3)
    # smoothing: small's share rises above proportional, stays below uniform
    assert 1 / 9 < w["small"] < 0.5
    assert abs(sum(w.values()) - 1.0) < 1e-12
    # zero-size sources get weight 0, not a crash
    assert temperature_weights({"a": 10, "b": 0})["b"] == 0.0
    with _pytest.raises(ValueError):
        temperature_weights(sizes, alpha=-1)
    with _pytest.raises(ValueError):
        temperature_weights({"a": 0})

    big = spark.range(0, 800).select(F.col("id").alias("doc_id"))
    small = spark.range(10_000, 10_100).select(F.col("id").alias("doc_id"))
    sources = {"big": big, "small": small}
    tw = temperature_weights({k: df.count() for k, df in sources.items()}, 0.3)
    mix = weighted_mixture(sources, tw, id_col="doc_id")
    got = {r["source"]: r["cnt"] for r in
           mix.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # small is the binding source (taken ~whole); big thinned toward
    # its smoothed share: big/small ≈ w_big/w_small = (8)^0.3 ≈ 1.87
    ratio = got["big"] / got["small"]
    assert 1.4 < ratio < 2.4, got
    # deterministic re-run
    mix2 = weighted_mixture(sources, tw, id_col="doc_id")
    assert sorted(r["doc_id"] for r in mix.collect()) == sorted(
        r["doc_id"] for r in mix2.collect()
    )
