"""PII redaction + chunking unit edges (functions/text.py); the
oracle parity twins are txt05/txt06."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_framework_spark.functions.text import chunk_text, pii_counts, redact_pii


def test_redact_all_categories(spark):
    df = spark.createDataFrame(
        [(
            "mail a.b+c@x.co.uk card 1234-5678-9012-3456 ssn 123-45-6789 "
            "tel 555-123-4567 ip 192.168.0.1 clean words",
        )],
        "t string",
    )
    out = df.select(redact_pii(F.col("t")).alias("r")).first()["r"]
    assert out == "mail [EMAIL] card [CC] ssn [SSN] tel [PHONE] ip [IP] clean words"
    counts = df.select(
        *[c.alias(k) for k, c in pii_counts(F.col("t")).items()]
    ).first()
    assert counts.asDict() == {
        "email": 1, "credit_card": 1, "ssn": 1, "phone": 1, "ipv4": 1
    }


def test_redact_leaves_clean_text_alone(spark):
    df = spark.createDataFrame([("just 12 plain words, v1.2 release",)], "t string")
    assert df.select(redact_pii(F.col("t")).alias("r")).first()["r"] == (
        "just 12 plain words, v1.2 release"
    )


def test_chunk_offsets_and_overlap(spark):
    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = (
        chunk_text(df, chunk_chars=40, overlap_chars=10)
        .orderBy("chunk_idx")
        .collect()
    )
    # step 30: ceil(max(100-10,1)/30) = 3 chunks at offsets 0/30/60
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert rows[0].chunk == text[0:40]
    assert rows[1].chunk == text[30:70]
    assert rows[2].chunk == text[60:100]
    # consecutive chunks share exactly the overlap
    assert rows[0].chunk[-10:] == rows[1].chunk[:10]


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id int, text string")
    rows = chunk_text(df, chunk_chars=100, overlap_chars=20).collect()
    assert len(rows) == 1 and rows[0].chunk == "tiny"


def test_chunk_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_text(df, chunk_chars=10, overlap_chars=10)


def test_chunk_text_reconstructs_original_property(spark):
    """Property: chunks are exact substrings at step offsets, and
    stitching chunk_0 + suffix-after-overlap of each later chunk
    reproduces the document byte-for-byte — no gaps, no drift, for
    assorted (chunk, overlap, length) shapes including shorter-than-
    one-chunk and exact-boundary documents."""
    import hashlib

    from pyspark.sql import functions as F

    from ai_etl_framework_spark.functions.text import chunk_text

    docs, expect = [], {}
    cases = [(40, 10), (40, 0), (7, 3), (100, 99)]
    for i, (chunk, over) in enumerate(cases):
        for j, n in enumerate([0, 1, chunk - 1, chunk, chunk + 1,
                               3 * chunk, 3 * chunk + 5]):
            did = i * 100 + j
            text = "".join(
                hashlib.md5(f"{did}:{k}".encode()).hexdigest()[0] for k in range(n)
            )
            docs.append((did, text, chunk, over))
            expect[did] = text
    df = spark.createDataFrame(
        [(d, t) for d, t, _, _ in docs], "doc_id long, text string"
    )
    for chunk, over in cases:
        ids = [d for d, _, c, o in docs if (c, o) == (chunk, over)]
        sub = df.where(F.col("doc_id").isin(ids))
        rows = chunk_text(sub, "text", ["doc_id"], chunk_chars=chunk,
                          overlap_chars=over).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
        step = chunk - over
        for did in ids:
            text = expect[did]
            chunks = [v for _, v in sorted(by_doc.get(did, {}).items())]
            if text == "":
                # empty doc yields one empty chunk or none — either way
                # reconstruction is the empty string
                assert "".join(chunks) == ""
                continue
            # every chunk is the exact substring at its offset
            for idx, c in enumerate(chunks):
                assert c == text[idx * step: idx * step + chunk], (did, idx)
            # stitched back together == original
            rebuilt = chunks[0] + "".join(c[over:] for c in chunks[1:])
            assert rebuilt == text, (did, chunk, over)
