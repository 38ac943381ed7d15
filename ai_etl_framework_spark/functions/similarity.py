"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one projection + TakeOrdered,
fully distributed, exact. Scale path: LSH bucketing via deterministic
random hyperplanes (signs of dot products) or an IVF-style coarse
quantizer over an existing cluster/label column; both turn the O(n)
scan per query into an O(n/buckets) probe.

Everything numeric is JVM-side (F.aggregate / F.zip_with) — no
Python, no UDF — so the dot products run inside whole-stage codegen.
For large batched query workloads a Pandas-UDF matmul variant
(numpy BLAS over Arrow batches) is provided as ``topk_batch_pandas``.
"""

from __future__ import annotations

import hashlib
import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector is NULL or zero-norm (a zero vector has
    no direction). The explicit guard matches DuckDB, where x/0 is
    NULL, and keeps the expression safe under ANSI sessions (the
    driver's plain session has spark.sql.ansi.enabled=true, where a
    bare 0/0 would *error*, not NULL out)."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (zero vectors pass through)."""
    n = norm(a)
    return F.when(
        n > 0, F.transform(a, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(a, lambda x: x.cast("double")))


def lit_vec(v: Sequence[float]) -> Column:
    """Literal double array in ONE JVM parse (r13): the per-element
    ``F.lit`` loop cost ~2 py4j round trips per dimension — ~0.1 s of
    plan-build latency for a 64-dim query vector. ``repr`` round-trips
    doubles exactly; non-finite values (no SQL literal form) keep the
    Column-API path."""
    vals = [float(x) for x in v]
    if vals and all(math.isfinite(x) for x in vals):
        return F.expr("array(" + ", ".join(f"{x!r}D" for x in vals) + ")")
    return F.array(*[F.lit(x) for x in vals])


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    Plan shape: scan → project(cosine) → TakeOrderedAndProject(k) —
    no shuffle of the data, only k rows to the driver per partition.
    """
    q = lit_vec(query)
    sim = F.round(cosine(F.col(vec_col), q), round_to)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH bucketing (random hyperplanes, deterministic)
# ---------------------------------------------------------------------------

def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-gaussian hyperplane from md5 bytes —
    reproducible across runs/engines with no RNG state."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        for j in range(0, 16, 2):
            if len(out) >= dim:
                break
            u = int.from_bytes(h[j : j + 2], "big") / 65535.0
            out.append(u * 2.0 - 1.0)
        i += 1
    return out


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-of-dot-product LSH bucket id in [0, 2^n_planes)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = lit_vec(_hyperplane(p, dim))
        bit = F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    round_to: int = 6,
    bucket_col: Optional[str] = None,
) -> DataFrame:
    """Approximate top-k: search only buckets within ``probe_hamming``
    bits of the query's bucket. With b planes this prunes the scan to
    ~(1 + b)/2^b of the data at hamming 1.

    ``bucket_col`` reuses a precomputed bucket column (the 100 TB
    pattern: bucket once at ingest, partition the table by bucket so
    probes become partition-pruned scans).
    """
    dim = len(query)
    qb = 0
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        d = sum(x * y for x, y in zip(query, plane))
        qb = qb * 2 + (1 if d >= 0 else 0)
    probe = [qb]
    if probe_hamming >= 1:
        probe += [qb ^ (1 << i) for i in range(n_planes)]
    if probe_hamming >= 2:
        probe += [
            qb ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    bcol = F.col(bucket_col) if bucket_col else hyperplane_bucket(F.col(vec_col), dim, n_planes)
    pruned = df.withColumn("__bucket", bcol).where(F.col("__bucket").isin(probe))
    return brute_force_topk(pruned, vec_col, id_col, query, k, round_to)


# ---------------------------------------------------------------------------
# IVF-style coarse search over an existing partition/label column
# ---------------------------------------------------------------------------

def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """IVF: centroids per cell (one small agg), probe the ``nprobe``
    closest cells, exact search inside. Centroid table is tiny →
    computed and ranked driver-side; the big scan is cell-pruned.

    A NULL cell id forms its own probeable cell: groupBy keeps the
    NULL group, and probing it uses ``isNull()`` (a bare ``isin``
    would silently drop those rows — with nprobe = n_cells this path
    must degrade to an exact full scan, NULL-labeled vectors
    included)."""
    dim = len(query)
    sums = df.groupBy(cell_col).agg(
        *[F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c{i}") for i in range(dim)],
    )
    cents = sums.collect()
    scored = []
    for r in cents:
        c = [r[f"c{i}"] for i in range(dim)]
        if any(x is None for x in c):  # all-NULL vector group
            d = float("inf")
        else:
            d = sum((x - y) ** 2 for x, y in zip(c, query))
        scored.append((r[cell_col], d))
    probe_cells = [c for c, _ in sorted(scored, key=lambda t: t[1])[:nprobe]]
    non_null = [c for c in probe_cells if c is not None]
    pred = F.col(cell_col).isin(non_null) if non_null else F.lit(False)
    if any(c is None for c in probe_cells):
        pred = pred | F.col(cell_col).isNull()
    pruned = df.where(pred)
    return brute_force_topk(pruned, vec_col, id_col, query, k, round_to)


# ---------------------------------------------------------------------------
# k-means coarse quantizer for IVF (when no meaningful cell column exists)
# ---------------------------------------------------------------------------

def kmeans_cells(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 8,
    sample_rows: int = 100_000,
) -> list[list[float]]:
    """Deterministic Lloyd centroids fit on a bounded driver sample.

    Scale path: only ``sample_rows`` vectors ever reach the driver (a
    k×dim centroid matrix is broadcast back); the full-table cell
    assignment stays distributed in :func:`assign_cells`. Seeding is
    md5-based so repeated runs agree.
    """
    import hashlib

    import numpy as np

    sample = (
        df.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.col(id_col).asc())
        .limit(sample_rows)
        .collect()
    )
    if not sample:
        raise ValueError("kmeans_cells: no non-null vectors to cluster")
    ids = [r[0] for r in sample]
    V = np.asarray([list(r[1]) for r in sample], dtype=np.float64)
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    # fewer vectors than requested cells: degrade to n cells instead of
    # indexing past the seeded centroid matrix (r4 review)
    k = min(k, len(ids))
    seed_order = np.argsort(
        [int(hashlib.md5(f"ivf:{i}".encode()).hexdigest(), 16) for i in ids]
    )[:k]
    C = V[seed_order]
    for _ in range(iters):
        assign = np.argmax(V @ C.T, axis=1)
        C = np.stack(
            [V[assign == c].mean(axis=0) if (assign == c).any() else C[c] for c in range(k)]
        )
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return [[float(x) for x in row] for row in C]


def kmeans_cells_ml(
    df: DataFrame,
    vec_col: str,
    k: int = 8,
    max_iter: int = 20,
    seed: int = 13,
) -> list[list[float]]:
    """Fully-distributed k-means coarse quantizer via Spark MLlib.

    The scale path past :func:`kmeans_cells`'s bounded driver sample:
    MLlib's KMeans trains on EVERY vector (k-means|| init, per-
    partition partial aggregation per iteration), so centroid quality
    doesn't degrade when the corpus far exceeds what a driver sample
    can represent. Vectors are L2-normalized first (spherical
    k-means — matches the cosine geometry of :func:`assign_cells` and
    :func:`ivf_topk`); only the k×dim centroid matrix comes back to
    the driver. Fixed ``seed`` makes runs reproducible FOR A FIXED
    PARTITION LAYOUT only: k-means|| init samples per partition, so a
    different core count, file split, or upstream exchange yields
    different (equally valid) centroids. For bit-exact centroids
    across environments use :func:`kmeans_cells` (md5-seeded driver
    sample); this path trades that for full-corpus training.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    unit = l2_normalize(F.col(vec_col))
    feats = df.select(array_to_vector(unit.cast("array<double>")).alias("features"))
    model = KMeans(k=k, maxIter=max_iter, seed=seed).fit(feats)
    C = np.asarray([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return [[float(x) for x in row] for row in C]


def assign_cells(
    df: DataFrame,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    cell_col: str = "__cell",
) -> DataFrame:
    """Nearest-centroid (max cosine) cell id per row — one Arrow-batched
    matmul per partition, centroid matrix broadcast via closure.
    At ingest time this is the "bucket once, partition by cell" column
    that turns IVF probes into partition-pruned scans."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def _cell_fn(vecs):
        # NULL embeddings get cell -1 (no probe list contains it, so
        # they are simply never candidates) instead of crashing the
        # task via np.asarray(None) inside np.stack
        mask = vecs.notna().to_numpy()
        out = np.full(len(vecs), -1, dtype="int32")
        if mask.any():
            M = np.stack(
                vecs[mask].apply(lambda v: np.asarray(v, dtype=np.float64))
            )
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            out[mask] = np.argmax(M @ C.T, axis=1).astype("int32")
        return pd.Series(out)

    # real-class annotations: `from __future__ import annotations` would
    # stringify inline hints beyond pyspark's type-hint resolver
    _cell_fn.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    _cell = pandas_udf(_cell_fn, "int")

    return df.withColumn(cell_col, _cell(F.col(vec_col)))


# ---------------------------------------------------------------------------
# batched queries: Arrow + numpy matmul
# ---------------------------------------------------------------------------

def _round_half_up(x, digits: int):
    """HALF_UP (round half away from zero) on the BINARY value —
    matches DuckDB's ROUND, i.e. the sim01 oracle every engine is
    gated against (np.round's half-to-even does not). Note: Spark's
    F.round goes through BigDecimal on the DECIMAL string, so at the
    measure-zero boundary doubles whose decimal rendering ends in
    ...5 the expr path can round the other way — that divergence is
    F.round-vs-DuckDB and pre-exists for every ROUND-using gated
    query; no real cosine/aggregate has ever landed on one."""
    import numpy as np

    scale = 10.0 ** digits
    return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)

def topk_batch_pandas(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: list[Sequence[float]],
    k: int = 10,
) -> DataFrame:
    """Many queries at once: per Arrow batch, one numpy matmul
    (queries × batch) then a local partial top-k; global top-k via
    groupBy(query_idx). This is the high-throughput path when the
    per-query expression approach would rebuild the plan per query."""
    import numpy as np
    import pandas as pd

    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    n_q = len(queries)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL embeddings and zero vectors have no cosine: both get
            # cos_sim NULL, exactly like the expression path's guarded
            # cosine() and DuckDB's x/0. They are still CANDIDATE rows
            # (k per batch, smallest ids — the global tie-break order)
            # so a corpus with fewer than k real vectors returns the
            # same row set on every engine instead of silently
            # shrinking here.
            ids_all = pdf[id_col].to_numpy()
            has_vec = pdf[vec_col].notna().to_numpy()
            if has_vec.any():
                m = np.stack(
                    pdf[vec_col][has_vec].apply(
                        lambda v: np.asarray(v, dtype=np.float64)
                    )
                )
                norms = np.linalg.norm(m, axis=1, keepdims=True)
                nz = (norms[:, 0] > 0.0)
                m = m[nz] / np.maximum(norms[nz], 1e-300)
            else:
                nz = np.zeros(0, dtype=bool)
                m = np.zeros((0, q.shape[1]))
            real_ids = ids_all[has_vec][nz]
            null_ids = np.sort(
                np.concatenate([ids_all[~has_vec], ids_all[has_vec][~nz]])
            )[:k]
            sims = qn @ m.T  # (n_q, n_real)
            for qi in range(n_q):
                # partial selection on (rounded sim desc, id asc) — the
                # SAME total order the global window uses, so a boundary
                # tie can never keep a different row than the global
                # top-k would (deterministic ≡ the expression path).
                # Rounding is HALF_UP (away from zero), matching F.round
                # and DuckDB ROUND — np.round's half-to-even would flip
                # a cosine landing exactly on a 5e-7 boundary by 1e-6
                # and reorder the tie-break vs the expression path.
                s = _round_half_up(sims[qi], 6)
                top = np.lexsort((real_ids, -s))[:k]
                yield pd.DataFrame(
                    {
                        "query_idx": qi,
                        id_col: np.concatenate([real_ids[top], null_ids]),
                        # NaN → NULL through Arrow (from_pandas), so the
                        # directionless rows sort after every real one
                        # under desc_nulls_last below
                        "cos_sim": np.concatenate(
                            [s[top], np.full(null_ids.size, np.nan)]
                        ),
                    }
                )

    partial = df.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_idx int, {id_col} long, cos_sim double"
    )
    from pyspark.sql import Window
    from pyspark.sql.functions import row_number

    w = Window.partitionBy("query_idx").orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col(id_col).asc()
    )
    return partial.withColumn("__rn", row_number().over(w)).where(F.col("__rn") <= k).drop("__rn")


# ---------------------------------------------------------------------------
# KNN join: top-k neighbors for EVERY vector (r9)
# ---------------------------------------------------------------------------

def knn_join(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    method: str = "matmul",
    max_index_rows: int = 200_000,
    n_cells: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """Top-``k`` cosine nearest neighbors for EVERY vector —
    ``(id, neighbor_id, rank, cos_sim)``, self excluded, ties broken
    neighbor-id ascending on the 6dp-rounded similarity (the shared
    sim01 ordering contract). NULL and zero-norm vectors have no
    direction: they produce no query rows and are never neighbors.

    Two paths (the sim01 exact/approx dual, as a JOIN):

    - ``method="matmul"`` — EXACT: the index side (id, unit vector)
      is collected once under a fail-loud ``max_index_rows`` cap
      (200k × 64 float64 ≈ 100 MB — the task-broadcast budget; same
      bounded-collect contract as the IVF centroid fit) and closure-
      broadcast; one Arrow-batched numpy matmul per partition, local
      top-k per row, NO shuffle at all — query rows never leave
      their partition. The oracle-twin path.
    - ``method="ivf"`` — APPROXIMATE, fully distributed (the 100 TB
      path): md5-seeded k-means centroids (bounded driver fit), each
      vector probes its ``nprobe`` nearest cells, neighbors live in
      their argmax home cell, candidates join ON THE CELL KEY (the
      shuffle is |probes| int-keyed rows, never all-pairs), exact
      cosine over candidates, per-query top-k via a rank window
      Spark 4 executes as WindowGroupLimit (k rows per query survive
      each partition BEFORE the shuffle). Recall floor vs exact is
      pinned in tests/test_knn_join.py.
    """
    import numpy as np
    import pandas as pd

    if method == "matmul":
        # Derive the output id type from the input (ADVICE r9): the IVF
        # path keeps the id column natively, so the matmul path must not
        # silently assume int64 — integral ids ride as int64, string ids
        # as object arrays (both lexsort/compare fine); anything else is
        # a clear up-front error instead of an opaque numpy cast failure.
        from pyspark.sql import types as T

        id_type = df.schema[id_col].dataType
        if isinstance(
            id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            id_sql, id_np = "long", np.int64
        elif isinstance(id_type, T.StringType):
            id_sql, id_np = "string", object
        else:
            raise TypeError(
                f"knn_join(method='matmul') needs an integral or string "
                f"id column; {id_col!r} is {id_type.simpleString()} — "
                "cast it first, or use method='ivf' (keeps the id type)"
            )
        out_schema = (
            f"{id_col} {id_sql}, neighbor_id {id_sql}, "
            "rank long, cos_sim double"
        )
        valid = df.select(id_col, vec_col).where(F.col(vec_col).isNotNull())
        head = valid.limit(max_index_rows + 1).collect()
        if len(head) > max_index_rows:
            raise ValueError(
                f"index side exceeds max_index_rows={max_index_rows}; "
                "use method='ivf' (distributed cell-blocked join) or "
                "raise the cap explicitly"
            )
        ids_all = np.asarray([r[0] for r in head], dtype=id_np)
        V = np.asarray([list(r[1]) for r in head], dtype=np.float64)
        if V.size == 0:
            return df.sparkSession.createDataFrame([], out_schema)
        norms = np.linalg.norm(V, axis=1)
        nz = norms > 0.0
        index_ids = ids_all[nz]
        index_m = V[nz] / norms[nz, None]

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mask = pdf[vec_col].notna().to_numpy()
                if not mask.any():
                    continue
                q_ids = pdf[id_col].to_numpy()[mask]
                Q = np.stack(
                    pdf[vec_col][mask].apply(
                        lambda v: np.asarray(v, dtype=np.float64)
                    )
                )
                qn = np.linalg.norm(Q, axis=1)
                qz = qn > 0.0
                if not qz.any():
                    continue
                q_ids = q_ids[qz]
                Q = Q[qz] / qn[qz, None]
                sims = _round_half_up(Q @ index_m.T, 6)
                # self-exclusion by id, not by position: the index is
                # the whole corpus, queries are this partition's slice
                for row, qid in enumerate(q_ids):
                    s = sims[row]
                    keep = index_ids != qid
                    cand_ids = index_ids[keep]
                    cand_s = s[keep]
                    top = np.lexsort((cand_ids, -cand_s))[:k]
                    if top.size == 0:
                        continue
                    yield pd.DataFrame(
                        {
                            id_col: qid,
                            "neighbor_id": cand_ids[top],
                            "rank": np.arange(1, top.size + 1, dtype=np.int64),
                            "cos_sim": cand_s[top],
                        }
                    )

        return df.select(id_col, vec_col).mapInPandas(score, schema=out_schema)

    if method != "ivf":
        raise ValueError(f"method must be 'matmul' or 'ivf', got {method!r}")

    from pyspark.sql import Window

    cents = kmeans_cells(df, vec_col, id_col, k=n_cells)
    C = np.asarray(cents, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    nprobe = min(nprobe, len(cents))

    def probe_fn(vecs):
        mask = vecs.notna().to_numpy()
        out = []
        M = None
        if mask.any():
            M = np.stack(
                vecs[mask].apply(lambda v: np.asarray(v, dtype=np.float64))
            )
            n = np.linalg.norm(M, axis=1, keepdims=True)
            M = M / np.maximum(n, 1e-300)
            sims = M @ C.T
            tops = np.argsort(-sims, axis=1)[:, :nprobe]
        j = 0
        for ok in mask:
            if ok:
                out.append([int(c) for c in tops[j]])
                j += 1
            else:
                out.append(None)
        return pd.Series(out)

    from pyspark.sql.functions import pandas_udf

    probe_fn.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    _probes = pandas_udf(probe_fn, "array<int>")

    base = df.select(id_col, vec_col).where(
        F.col(vec_col).isNotNull() & (norm(F.col(vec_col)) > 0)
    )
    left = base.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qv"),
        F.explode(_probes(F.col(vec_col))).alias("__cell"),
    )
    right = assign_cells(base, vec_col, cents, "__cell").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__nv"),
        "__cell",
    )
    cand = left.join(right, "__cell").where(
        F.col("__qid") != F.col("neighbor_id")
    )
    scored = cand.select(
        F.col("__qid"),
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__nv")), 6).alias("cos_sim"),
    ).where(F.col("cos_sim").isNotNull())
    w = Window.partitionBy("__qid").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(id_col), "neighbor_id", "rank", "cos_sim")
    )
