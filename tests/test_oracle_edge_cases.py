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


EVENT_EDGE_QUERIES = [
    "q10_anomaly_methods",
    "q17_window_events",
    "q28_sessionize",
    "q33_topk_per_group",
    "q34_asof_join",
    "q35_range_join",
    "q38_window_analytics",
    "q39_json_extract",
    "sk01_sketch_bounds",
]


@pytest.fixture(scope="module")
def event_edge_dir(spark, tmp_path_factory):
    """Events with the boundary rows the driver testdata lacks: NULL
    timestamp, NULL value, NULL user/type, duplicate (user, ts) pairs,
    NULL and malformed JSON props."""
    from datetime import datetime, timedelta

    d = str(tmp_path_factory.mktemp("edge_events_sf"))
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    types = ["view", "click", "purchase", "error"]
    for i in range(60):
        rows.append(
            (i, t0 + timedelta(minutes=7 * i), i % 5, types[i % 4],
             float(10 + (i * 37) % 200), '{"k": %d}' % (i % 9))
        )
    rows += [
        (100, None, 1, "view", 5.0, '{"k": 1}'),          # NULL ts
        (101, t0 + timedelta(minutes=3), 1, "view", None, '{"k": 2}'),  # NULL value
        (102, t0 + timedelta(minutes=4), None, "click", 7.0, '{"k": 3}'),  # NULL user
        (103, t0 + timedelta(minutes=5), 2, None, 8.0, '{"k": 4}'),    # NULL type
        (104, t0 + timedelta(minutes=14), 2, "view", 9.0, None),       # NULL props
        (105, t0 + timedelta(minutes=14), 2, "view", 9.5, "not json"), # bad props
        # duplicate (user, ts) with the row right above
        (106, t0 + timedelta(minutes=14), 2, "view", 1.5, '{"k": 5}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", EVENT_EDGE_QUERIES)
def test_edge_events_oracle_parity(spark, event_edge_dir, name):
    qs, oq = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, event_edge_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{event_edge_dir}/events.parquet/*.parquet')"
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
