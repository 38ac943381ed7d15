"""Deterministic sampling, splitting, mixing and packing for
training-data pipelines.

Everything here is **hash-deterministic**: membership decisions derive
from ``md5(id)`` rather than an RNG, so results are identical across
engines (the DuckDB oracle computes the same bytes), across cluster
sizes, and across reruns — the property that matters when a 100 TB
corpus is sampled incrementally and yesterday's decisions must not
flip. ``Sample``/``rand()`` cannot give you that: Spark's rand() is
seeded per-partition, so a repartition changes the sample.

No reference counterpart (the reference has no sampling surface);
these extend the LLM-training-data operator family (SURVEY §7 phase 7)
alongside dedup/similarity/text.

Ops:
- ``hash_uniform``      — md5-derived U[0,1) column, the shared primitive
- ``deterministic_sample`` — keep fraction f, reproducibly
- ``hash_split``        — disjoint train/val/test by hash ranges
- ``stratified_quota``  — per-class cap via hash-ranked row_number
- ``weighted_mixture``  — combine corpora to target proportions
  (driver-side waterfilling over counts; per-source hash sampling)
- ``pack_documents``    — greedy sequence packing into token bins,
  bucket-parallel (applyInPandas; no global state)
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "deterministic_sample",
    "hash_split",
    "stratified_quota",
    "stratified_sample",
    "weighted_sample",
    "weighted_mixture",
    "pack_documents",
    "shuffle_deterministic",
    "upsample",
    "group_sample",
]


def hash_uniform(id_col: Column, salt: str = "") -> Column:
    """U[0,1) from the first 8 hex chars of md5(id || salt) — 32 bits
    of uniformity, byte-identical in any engine with md5 + string
    concat (DuckDB twin, sentinel included:
    ``('0x' || substr(md5(COALESCE(CAST(id AS VARCHAR), chr(0)) || salt),
    1, 8))::BIGINT / 4294967296.0``).
    Change ``salt`` to draw an independent sample from the same ids.

    NULL ids hash as the sentinel ``'\\x00'`` (no printable id equals
    it) instead of propagating NULL — a NULL hash would silently DROP
    those rows from any sample (``NULL < f`` is never true, even at
    fraction 1.0) and dump them all into the last hash_split range.
    With the sentinel they behave like any other single id value:
    all-or-none membership, one deterministic split."""
    h = F.md5(F.concat(F.coalesce(id_col.cast("string"), F.lit("\x00")), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ≈``fraction`` of rows, membership decided per-id by hash —
    stable under repartitioning, engine-portable, and monotone: the
    10% sample is a subset of the 20% sample (same salt), so scaling
    a corpus subset up never discards previously selected documents."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_uniform(F.col(id_col), salt) < fraction)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions,
    id_col: str,
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` shape,
    hash-deterministic): keep a row iff
    ``hash_uniform(id) < fractions[stratum]`` — each stratum gets its
    own fraction (downweight boilerplate sources, keep all rare
    languages), with every guarantee ``deterministic_sample``
    documents (repartition-stable, engine-portable, monotone in the
    fraction per stratum). Strata absent from ``fractions`` — and
    NULL strata — use ``default`` (0.0 = drop, the sampleBy
    convention). One projection + filter; membership is a CASE over
    the stratum, no join, no RNG."""
    fractions = dict(fractions)
    if not fractions:
        raise ValueError("stratified_sample needs at least one fraction")
    for k, v in fractions.items():
        if not 0.0 <= float(v) <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    frac = F.lit(float(default))
    for k, v in fractions.items():
        frac = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(frac)
    return df.where(hash_uniform(F.col(id_col), salt) < frac)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis (2006) one-pass reservoir scheme with the
    repo's hash-uniform in place of an RNG: each row draws
    ``u = hash_uniform(id)`` and scores ``key = u^(1/w)``; the ``n``
    LARGEST keys are the sample. Inclusion probability is
    proportional to weight, the draw is reproducible (same id+salt ⇒
    same u on any engine/partitioning), and the whole thing is one
    projection + a distributed top-k (TakeOrdered — per-partition
    heaps, no global sort).

    Pinned for the oracle: the ranking key is ROUNDED to 9dp with
    ``id_col`` ascending as the tiebreak — pow/ln differ in the last
    ulp across engines, and an unpinned continuous key would make the
    rank-n boundary row engine-dependent. Rows with NULL, zero or
    negative weight are excluded (they have no selection mass;
    E-S defines keys for w > 0 only)."""
    if n <= 0:
        raise ValueError(f"n must be > 0, got {n}")
    w = F.col(weight_col).cast("double")
    u = hash_uniform(F.col(id_col), salt)
    key = F.round(F.pow(u, F.lit(1.0) / w), 9)
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__es_key")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: Sequence[float] = (0.8, 0.1, 0.1),
    names: Optional[Sequence[str]] = None,
    salt: str = "",
) -> DataFrame:
    """Disjoint, exhaustive split by hash ranges: adds a ``split``
    column. fractions must sum to 1 (±1e-9). Deterministic, so a
    document can never migrate between train and test across runs —
    the leakage guarantee a training pipeline actually needs."""
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions)}")
    names = list(names) if names else [f"split_{i}" for i in range(len(fractions))]
    if len(names) != len(fractions):
        raise ValueError("names and fractions length mismatch")
    u = hash_uniform(F.col(id_col), salt)
    edges, acc = [], 0.0
    for frac in fractions:
        acc += frac
        edges.append(acc)
    expr = F.lit(names[-1])  # top range catches u in [last_edge, 1)
    for name, hi in zip(reversed(names[:-1]), reversed(edges[:-1])):
        expr = F.when(u < hi, name).otherwise(expr)
    return df.withColumn("split", expr)


def shuffle_deterministic(df: DataFrame, id_col: str, salt: str = "") -> DataFrame:
    """Reproducible global pseudo-random order: sort by
    ``md5(id || salt)`` (ties broken by id). The shuffle every
    training run needs before sequence packing/sharding, without an
    RNG — same salt ⇒ same order on any cluster size; bump the salt
    per epoch for a fresh permutation.

    Scale shape: one range-partitioned sort (Spark samples hash
    boundaries, partitions sort independently) — the standard
    distributed sort, no single-task stage. To materialize positions,
    follow with ``sources.readers.with_row_id`` after writing, or
    pack directly: ``pack_documents`` already orders by the same
    md5-of-id inside each bucket."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return df.orderBy(h.asc(), F.col(id_col).asc())


def upsample(
    df: DataFrame,
    weight,
    id_col: str,
    salt: str = "",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic weighted upsampling (epoch mixing): each row is
    replicated ``floor(w)`` times plus one more with probability
    ``frac(w)``, decided by the id hash — the standard way to hit
    fractional dataset mixing weights (e.g. wiki×2.5) exactly in
    expectation while staying reproducible. ``weight`` is a column
    name, Column expression, or scalar. Rows with effective weight 0
    drop out; ``copy_col`` numbers the copies 1..n so downstream
    shuffling can spread them across shards.

    Pure narrow explode — no shuffle; output size = Σ n_copies."""
    if isinstance(weight, str):
        w = F.col(weight).cast("double")
    elif isinstance(weight, Column):
        w = weight.cast("double")
    else:
        w = F.lit(float(weight))
    base = F.floor(w).cast("long")
    extra = (hash_uniform(F.col(id_col), salt) < (w - F.floor(w))).cast("long")
    n = (base + extra).alias("__n_copies")
    return (
        df.withColumn("__n_copies", n)
        .where(F.col("__n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .drop("__n_copies")
    )


def stratified_quota(
    df: DataFrame, class_col: str, id_col: str, quota: int
) -> DataFrame:
    """At most ``quota`` rows per class, selected by hash rank (the
    deterministic analog of uniform within-class sampling). One
    shuffle on class; rank is md5-ordered so the survivors are a
    stable pseudo-random subset, not head-of-file bias. Classes hot
    enough to skew the shuffle are exactly the ones being capped —
    AQE's skew handling covers the interim; for pathological single
    classes pre-salt with a two-phase rank."""
    from pyspark.sql import Window

    w = Window.partitionBy(class_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )


def weighted_mixture(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    id_col: str,
    salt: str = "",
    source_col: str = "source",
) -> DataFrame:
    """Combine corpora into a mixture matching target ``weights`` as
    closely as the data allows, tagged with ``source_col``.

    Waterfilling over driver-side counts (K scalars, one count() per
    source): find the largest total C such that every source i can
    supply C·w_i rows, i.e. C = min(n_i / w_i); then hash-sample each
    source down to C·w_i. Undersupplied sources are taken whole (the
    binding constraint); oversupplied ones are thinned
    deterministically. Columns are unified by name (missing → NULL).
    """
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have identical keys")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {k: w / total_w for k, w in weights.items()}
    counts = {k: df.count() for k, df in sources.items()}
    cap = min(
        counts[k] / norm[k] for k in sources if norm[k] > 0
    )
    all_cols: list[str] = []
    for df in sources.values():
        for c in df.columns:
            if c not in all_cols:
                all_cols.append(c)
    parts = []
    for name, df in sources.items():
        if norm[name] == 0:
            continue
        want = cap * norm[name]
        frac = min(1.0, want / counts[name]) if counts[name] else 0.0
        picked = deterministic_sample(df, id_col, frac, salt=f"{salt}|{name}")
        aligned = picked.select(
            *[
                F.col(c) if c in picked.columns else F.lit(None).alias(c)
                for c in all_cols
            ],
            F.lit(name).alias(source_col),
        )
        parts.append(aligned)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_weights(
    sizes: dict[str, float], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-smoothed mixture weights from corpus sizes — the
    mT5 sampling rule (Xue et al. 2021 §3.1, following Devlin's
    multilingual BERT exponent): ``w_i ∝ n_i^alpha``. ``alpha=1``
    reproduces size-proportional sampling, ``alpha→0`` approaches
    uniform; mT5 uses 0.3 to boost low-resource sources without
    drowning the head. Pure driver arithmetic over K scalars —
    compose with :func:`weighted_mixture`::

        sizes = {k: df.count() for k, df in sources.items()}
        mix = weighted_mixture(sources, temperature_weights(sizes),
                               id_col="doc_id")
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not sizes or any(n < 0 for n in sizes.values()):
        raise ValueError("sizes must be non-empty and non-negative")
    raised = {k: float(n) ** alpha if n > 0 else 0.0 for k, n in sizes.items()}
    total = sum(raised.values())
    if total <= 0:
        raise ValueError("at least one source must be non-empty")
    return {k: v / total for k, v in raised.items()}


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    num_buckets: int = 0,
) -> DataFrame:
    """Greedy sequence packing: assign each document to a ``pack_id``
    such that a pack's token total stays ≤ ``max_tokens`` (a document
    alone above the cap gets its own pack). Returns
    (id, tokens, bucket, pack_id, pack_tokens, pack_size).

    Scale shape: documents are hash-bucketed (``num_buckets``,
    default = current shuffle partitions), each bucket packs
    independently in one applyInPandas group scanning its docs in
    hash-of-id order (deterministic; order-invariant to input
    partitioning). Packing is embarrassingly parallel across buckets —
    no global sequential state, so 100 TB packs as width allows; the
    only cost vs a single global greedy pass is ≤1 underfilled pack
    per bucket. pack_id is globally unique as (bucket, seq).
    """
    if num_buckets <= 0:
        num_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("tokens"),
        (F.abs(F.xxhash64(F.col(id_col).cast("string"))) % num_buckets).alias("bucket"),
        F.md5(F.col(id_col).cast("string")).alias("__ord"),
    )
    # docs whose token count is NULL (tokenizer failure, outer join,
    # non-numeric cast) are EXCLUDED, not packed: Arrow hands them to
    # the kernel as float64 NaN, where int(t) would kill the whole
    # task and NaN would poison every pack_tokens sum it touched.
    # Count tokens first (functions.text.token_count) if they matter.
    # NULL ids are excluded for the same reason (NULL hashes to a NULL
    # bucket, which reaches the kernel as NaN and kills the task) —
    # and a document without an identity cannot be packed addressably.
    base = base.where(F.col("tokens").isNotNull() & F.col("id").isNotNull())

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord", kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        pack_ids, fill, seq = [], 0, -1
        for t in pdf["tokens"]:
            t = int(t)
            if seq < 0 or fill + t > max_tokens:
                seq += 1
                fill = 0
            fill += t
            pack_ids.append(bucket * 1_000_000_000 + seq)
        out = pdf.assign(pack_id=pack_ids)
        totals = out.groupby("pack_id")["tokens"].agg(["sum", "count"]).reset_index()
        totals.columns = ["pack_id", "pack_tokens", "pack_size"]
        return out.merge(totals, on="pack_id").drop(columns=["__ord"])

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [f for f in base.schema.fields if f.name != "__ord"]
        + [
            StructField("pack_id", LongType()),
            StructField("pack_tokens", LongType()),
            StructField("pack_size", LongType()),
        ]
    )
    return base.groupBy("bucket").applyInPandas(pack, schema=out_schema)


def group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample — the "show me 3
    examples from every source/language/cluster" primitive behind
    eyeballing, labeling queues and few-shot prompt construction.
    Rows rank by ``hash_uniform(id || salt)`` within their group (id
    ascending breaks hash ties), the first k survive — so unlike
    fraction sampling the quota is EXACT per group (small groups
    return all rows), and like every sampler here it is
    repartition-stable, engine-portable and replayable from the salt.

    Pinned semantics (oracle-replicated):
    - NULL groups drop (no quota to charge); NULL ids hash via the
      shared sentinel (one NULL id can win per group);
    - order = (hash_uniform asc, id asc) — a total order, so the
      selected SET is deterministic;
    - output = the input columns (no rank column), ≤ k rows/group.

    Scale shape: one hash projection + ONE per-group top-k window —
    Spark plans rank-filter windows as WindowGroupLimit (per-partition
    k-heaps BEFORE the exchange), so the shuffle carries ≤ k rows per
    (partition, group), never the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_uniform(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(group_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
