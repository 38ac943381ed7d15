"""Edge-corpus oracle parity: blank / whitespace-only / NULL documents
and zero / NULL embeddings, which the driver's synthetic testdata never
contains. Each gated text/dedup/similarity query runs Spark-vs-DuckDB
over the SAME edge-case parquet with the driver's canonical hash — so
the boundary semantics (empty token lists, NULL text, zero vectors)
are PROVEN to agree rather than just untested (r4 review: bare
string_split in the oracle fragments yielded [''] for blank text and
NULL for NULL text while Spark yields [])."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from scripts.drive_oracle import canon


# queries over documents/embeddings only (the edge tables we synthesize)
EDGE_QUERIES = [
    "dd01_fingerprint_dups",
    "dd02_signatures",
    "dd03_minhash_band_pairs",
    "dd04_ngram_jaccard",
    "txt01_text_profile",
    "txt05_pii_redact",
    "txt07_gopher_quality",
    "dc01_decontaminate",
    "sim02_embedding_dup_pairs",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_sf"))
    docs = [
        # normal docs incl. a near-dup pair and PII
        (0, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
        (1, "the quick brown fox jumps over the lazy dog again and again!", "en", "web", 61),
        (2, "contact me at alice@example.com or call 555-123-4567 today", "en", "mail", 59),
        (3, "une phrase en francais avec des mots differents et la suite", "fr", "web", 59),
        (4, "short", "en", "web", 5),
        # the edge cases the real testdata lacks
        (5, "", "en", "web", 0),
        (6, "   \t  \n ", "en", "web", 8),
        (7, None, "en", "web", 0),
        (8, "x", "en", "web", 1),
        (9, "dup dup dup dup dup dup dup dup", "en", "web", 31),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    embs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9999, 0.0141, 0.0, 0.0], 0),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.0, 0.70710678, 0.70710678], 1),
        (5, [0.0, 0.0, 0.0, 0.0], 1),          # zero vector
        (6, None, 1),                           # NULL embedding
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_oracle_parity(spark, edge_dir, name):
    qs, oq = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, edge_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        # Spark writes a directory; DuckDB needs the part-file glob
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{t}.parquet/*.parquet')"
        )
    res = con.execute(oq[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    sh, sn = canon(srows, scols)
    oh, on = canon(orows, ocols)
    assert sorted(scols) == sorted(ocols)
    assert (sh, sn) == (oh, on), (
        f"{name}: spark={sn} oracle={on}\n"
        f"  spark: {sorted('|'.join(map(str, r)) for r in srows)[:4]}\n"
        f"  duck : {sorted('|'.join(map(str, r)) for r in orows)[:4]}"
    )
