"""knn_join (functions/similarity.py): exact matmul path vs a numpy
brute-force model, NULL/zero-vector exclusion, fail-loud index cap,
and the IVF path's recall floor vs exact. 3-SF oracle parity is x27."""

from __future__ import annotations

import numpy as np
import pytest

# r14 driver-tier split (VERDICT r13 item 1): this suite is
# hypothesis/differential/e2e-heavy and runs in the SLOW tier
# (`pytest -m slow`); the driver's default `pytest tests/` keeps
# the contract/pin/parity suites inside its verify window.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from ai_etl_framework_spark.functions.similarity import knn_join


VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.9, 0.2]),
    (4, [0.5, 0.5, 0.0]),
    (5, None),             # NULL: no rows, never a neighbor
    (6, [0.0, 0.0, 0.0]),  # zero-norm: same
]


def _model(vecs, k):
    valid = [(i, np.asarray(v, float)) for i, v in vecs
             if v is not None and np.linalg.norm(v) > 0]
    out = {}
    for qid, q in valid:
        qn = q / np.linalg.norm(q)
        scored = []
        for nid, v in valid:
            if nid == qid:
                continue
            s = round(float(qn @ (v / np.linalg.norm(v))), 6)
            scored.append((-s, nid))
        scored.sort()
        out[qid] = [(nid, -negs) for negs, nid in scored[:k]]
    return out


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_matmul_matches_model(vec_df):
    got: dict[int, list] = {}
    for r in knn_join(vec_df, "embedding", "vec_id", k=3).collect():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
        )
    exp = _model(VECS, 3)
    assert set(got) == set(exp)  # 5 and 6 excluded as queries
    for qid in exp:
        rows = sorted(got[qid])
        assert [(rk, n) for rk, n, _ in rows] == [
            (i + 1, n) for i, (n, _) in enumerate(exp[qid])
        ]
        for (_, _, s), (_, es) in zip(rows, exp[qid]):
            assert s == pytest.approx(es, abs=1e-9)
    # NULL/zero vectors are never neighbors either
    all_neighbors = {n for lst in got.values() for _, n, _ in lst}
    assert 5 not in all_neighbors and 6 not in all_neighbors


def test_string_ids_matmul(spark):
    """The matmul path derives its output schema from the id type
    (ADVICE r9): string ids work end-to-end and agree with the long-id
    result; unsupported id types fail with a clear TypeError instead
    of an opaque numpy cast error."""
    sdf = spark.createDataFrame(
        [(f"d{i}", v) for i, v in VECS],
        "vec_id string, embedding array<double>",
    )
    got = knn_join(sdf, "embedding", "vec_id", k=3)
    assert dict(got.dtypes)["vec_id"] == "string"
    assert dict(got.dtypes)["neighbor_id"] == "string"
    exp = _model(VECS, 3)
    by_q: dict[str, list] = {}
    for r in got.collect():
        by_q.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
    assert set(by_q) == {f"d{q}" for q in exp}
    for qid in exp:
        assert sorted(by_q[f"d{qid}"]) == [
            (i + 1, f"d{n}") for i, (n, _) in enumerate(exp[qid])
        ]

    bad = spark.createDataFrame(
        [(1.5, [1.0, 0.0])], "vec_id double, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral or string"):
        knn_join(bad, "embedding", "vec_id", k=1)


def test_index_cap_fail_loud(vec_df):
    with pytest.raises(ValueError, match="max_index_rows"):
        knn_join(vec_df, "embedding", "vec_id", k=2, max_index_rows=3)


def test_method_validation(vec_df):
    with pytest.raises(ValueError, match="method"):
        knn_join(vec_df, "embedding", "vec_id", method="annoy")


def test_ivf_recall_floor(spark, sf_dir):
    """IVF with nprobe=3 of 8 cells must recover ≥60% of the exact
    top-5 edges on the real embeddings table (measured 0.686; the
    floor leaves margin — same spirit as x01's ANN floors; md5-seeded
    centroids make this deterministic)."""
    from ai_etl_framework_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_join(emb, "embedding", "vec_id", k=5).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_join(
            emb, "embedding", "vec_id", k=5, method="ivf",
            n_cells=8, nprobe=3,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.3f} below floor"
    # full probe (nprobe = n_cells) degrades to exact
    full = {
        (r["vec_id"], r["neighbor_id"])
        for r in knn_join(
            emb, "embedding", "vec_id", k=5, method="ivf",
            n_cells=4, nprobe=4,
        ).collect()
    }
    assert full == exact


def test_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert knn_join(empty, "embedding", "vec_id").count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert knn_join(nulls, "embedding", "vec_id").count() == 0
