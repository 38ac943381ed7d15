"""char_entropy (operators/textstats.py): pinned values, DuckDB
entropy() builtin cross-check (independent implementation, tolerance),
gibberish-vs-English separation, NULL/empty exclusion. 3-SF oracle
parity (identical-formula SQL) is x30."""

from __future__ import annotations

import math

import pytest

from ai_etl_framework_spark.operators.textstats import char_entropy


def test_pinned_values(spark):
    rows = [
        (1, "aaaa"),          # one symbol -> 0 bits
        (2, "ab"),            # uniform 2 -> 1 bit
        (3, "aab"),           # 2/3,1/3 -> 0.918296
        (4, None),            # no row
        (5, ""),              # no row
        (6, "abcd"),          # uniform 4 -> 2 bits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars"], r["entropy"])
        for r in char_entropy(df).collect()
    }
    assert set(got) == {1, 2, 3, 6}
    assert got[1] == (4, 0.0)
    assert got[2] == (2, 1.0)
    assert got[3][0] == 3
    assert got[3][1] == pytest.approx(
        -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3)), abs=1e-6
    )
    assert got[6] == (4, 2.0)


def test_matches_duckdb_builtin(spark, duck, sf_dir):
    """Independent-implementation cross-check: DuckDB's entropy()
    aggregate over the same char explode must agree to 1e-4 on the
    real documents table (summation order differs, so not exact)."""
    got = {
        r["doc_id"]: r["entropy"]
        for r in char_entropy(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    ref = dict(
        duck.execute(
            "SELECT doc_id, entropy(ch) FROM ("
            "  SELECT doc_id, unnest(string_split(text, '')) AS ch"
            "  FROM documents WHERE text IS NOT NULL) WHERE ch <> ''"
            " GROUP BY doc_id"
        ).fetchall()
    )
    assert set(got) == set(ref)
    for d in got:
        assert got[d] == pytest.approx(ref[d], abs=1e-4), d


def test_gibberish_scores_higher_than_prose(spark):
    rows = [
        (1, "the cat sat on the mat and then the cat sat some more"),
        (2, "x9$Kq2#Zr8!Wm5@Jd3%Vp7&Bt1*Ng6^Lf4(Hs0)Yc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy"] for r in char_entropy(df).collect()}
    assert got[2] > got[1] + 1.0  # clear separation in bits
