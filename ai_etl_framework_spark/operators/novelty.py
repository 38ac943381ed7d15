"""Document novelty scoring — how much of each document's k-shingle
set appears NOWHERE else in the corpus: the diversity/informativeness
axis of training-data curation (dedup removes copies; novelty RANKS
the survivors — a doc of boilerplate shingles scores ~0, genuinely
new content ~1). The per-document companion of the corpus-level
repeated-span removers (operators/corpus.py) and the DSIR/quality
samplers that consume a per-doc score. Beyond-reference scope.

Pinned semantics (oracle-replicated):

- shingles = the shared DISTINCT k-token shingle contract
  (operators/dedup.shingles — short docs collapse to one whole-doc
  shingle; blank docs have none);
- df(shingle) = number of DOCUMENTS containing it (distinct per doc
  by construction);
- per doc: (id, n_shingles, novelty, mean_log_df) where novelty =
  fraction of the doc's shingles with df == 1 (6dp) and mean_log_df
  = mean ln(df) over its shingles (6dp — 0 for an all-unique doc,
  grows with how boilerplate the doc is);
- docs with NO shingles (NULL/blank text) yield n_shingles = 0 and
  NULL novelty/mean_log_df (no evidence).

Scale shape: one explode → ONE (shingle → df) hash aggregation
(vocabulary-sized, map-side partials) → join back ON THE SHINGLE
(the tfidf unhinted-join contract: AQE decides broadcast vs shuffle)
→ one per-doc aggregation. Shuffles carry shingle hashes and (id,
df) ints — never document text. A LEFT join from the doc id frame
restores zero-shingle docs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "novelty_scores",
    "vocab_novelty",
    "trending_terms",
    "vocab_overlap",
    "vocab_richness",
]


def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, n_shingles, novelty, mean_log_df) — module pins."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from ai_etl_framework_spark.operators.dedup import shingles

    sh = df.select(
        F.col(id_col),
        F.explode(shingles(text_col, k)).alias("__sh"),
    )
    dfreq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        sh.join(dfreq, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.round(
                F.avg(F.when(F.col("__df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
            F.round(F.avg(F.log(F.col("__df").cast("double"))), 6).alias(
                "mean_log_df"
            ),
        )
    )
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        "novelty",
        "mean_log_df",
    )


def vocab_novelty(
    df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    bucket_unit: str = "day",
) -> DataFrame:
    """Vocabulary-novelty curve — per period: how many DISTINCT terms
    appeared, how many were NEVER SEEN before, the novelty ratio, and
    the running vocabulary size. The "is this crawl still finding new
    content or re-reading the same web" freshness screen a corpus
    ingest dashboard wants next to dedup rates (novelty of VOCAB
    complements novelty of SHINGLES: shingle_novelty ranks documents,
    this tracks the corpus over time). Beyond-reference scope.

    Pinned semantics (oracle-replicated):
    - tokens = the shared case-folded whitespace tokenizer; activity
      = DISTINCT (period, term) pairs (multiplicity within a period
      counts once); NULL ts drops;
    - first_seen(term) = its minimum period; n_new counts terms whose
      first_seen equals the period; new_ratio = n_new/n_terms 6dp;
    - vocab_cum = running Σ n_new over periods (= the distinct-vocab
      size through that period, by construction);
    - only periods with ≥1 token emit rows.

    Scale shape: one explode → ONE distinct (period, term) hash
    aggregation (map-side partials collapse the Zipf head), one
    vocab-sized min() aggregation, a vocab-dimension join, a
    period-level agg and one cumulative window over the PERIOD frame
    (calendar-sized). Raw text shuffles once, pre-collapsed."""
    from pyspark.sql import Window

    from ai_etl_framework_spark.functions.text import tokens

    pairs = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.date_trunc(bucket_unit, F.col(ts_col))
            .cast("date")
            .alias("period"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
    )
    first_seen = pairs.groupBy("term").agg(
        F.min("period").alias("__fs")
    )
    per_period = (
        pairs.join(first_seen, "term")
        .groupBy("period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(
                F.when(F.col("period") == F.col("__fs"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_new"),
        )
    )
    w_cum = Window.orderBy(F.col("period").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_period.select(
        "period",
        "n_terms",
        "n_new",
        F.round(
            F.col("n_new") / F.col("n_terms").cast("double"), 6
        ).alias("new_ratio"),
        F.sum("n_new").over(w_cum).cast("long").alias("vocab_cum"),
    )


def trending_terms(
    df: DataFrame,
    period_col,
    text_col: str = "text",
    top_rank: int = 100,
    top_k: int = 10,
) -> DataFrame:
    """Trending terms per period — for each ingest period, which
    terms climbed fastest up the frequency leaderboard vs the
    immediately preceding period: the "what's new in this crawl"
    screen corpus dashboards put next to the vocab-novelty curve
    (vocab_novelty counts NEVER-seen terms; this ranks RISING ones).
    Beyond-reference analytics scope (grep 'trending' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - tokens = the shared case-folded whitespace tokenizer; counts
      are token occurrences per (period, term); NULL periods drop;
    - per period, rank = row_number ordered by (count DESC, term
      ASC) — deterministic through ties — and only rank <= top_rank
      rows stay (the leaderboard);
    - periods are indexed densely in period order; prev_rank = the
      term's rank on the IMMEDIATELY preceding period's leaderboard
      (absent there → prev_rank NULL, is_new = true);
    - rank_delta = prev_rank − rank (positive = climbed);
    - output: for each period except the first, the top_k rows by
      (rank_delta DESC NULLS LAST, term ASC) — new entries rank
      after genuine risers by pinned convention; columns (period,
      term, n, rank, prev_rank, rank_delta, is_new).

    Scale shape: one explode → ONE (period, term) hash aggregation
    (map-side partials collapse the Zipf head), a per-period rank
    window the optimizer bounds via WindowGroupLimit, then EVERYTHING
    operates on the leaderboard frame (periods × top_rank rows): one
    dense period index window, one self-join on (term, period index),
    one WindowGroupLimit top_k. Nothing text-scale past the first
    aggregation."""
    if top_rank < 1:
        raise ValueError(f"top_rank must be >= 1, got {top_rank}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql import Window

    from ai_etl_framework_spark.functions.text import tokens

    per = period_col if not isinstance(period_col, str) else F.col(period_col)
    counts = (
        df.where(per.isNotNull())
        .select(per.alias("period"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("period", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    board = counts.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("period").orderBy(
                F.col("n").desc(), F.col("term").asc()
            )
        ),
    ).where(F.col("rank") <= top_rank)
    # dense period index over the leaderboard frame (periods × top_rank
    # rows — dimension-bounded single-partition window, the pareto
    # regime)
    board = board.withColumn(
        "pidx", F.dense_rank().over(Window.partitionBy().orderBy("period"))
    )
    prev = board.select(
        F.col("term").alias("term"),
        (F.col("pidx") + 1).alias("pidx"),
        F.col("rank").alias("prev_rank"),
    )
    joined = (
        board.where(F.col("pidx") >= 2)
        .join(prev, ["term", "pidx"], "left")
        .select(
            "period",
            "term",
            "n",
            "rank",
            "prev_rank",
            (F.col("prev_rank") - F.col("rank")).alias("rank_delta"),
            F.col("prev_rank").isNull().alias("is_new"),
        )
    )
    cut = F.row_number().over(
        Window.partitionBy("period").orderBy(
            F.col("rank_delta").desc_nulls_last(), F.col("term").asc()
        )
    )
    return joined.withColumn("__rn", cut).where(
        F.col("__rn") <= top_k
    ).drop("__rn")


def vocab_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between groups — Jaccard and
    overlap coefficient of the DISTINCT term sets of every group
    pair: the "are these two sources/shards/crawls the same kind of
    text" matrix corpus cards want next to per-source vocab counts
    (the set-level complement of x107's distinctive terms: log-odds
    says WHAT differs, this says HOW MUCH is shared).
    Beyond-reference analytics scope (grep 'vocab overlap' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - tokens = the shared case-folded whitespace tokenizer; the
      group's vocabulary is its DISTINCT term set (multiplicity
      ignored); NULL groups drop;
    - per unordered pair (group_a < group_b): n_both = |A ∩ B|,
      jaccard = n_both / (n_a + n_b − n_both), overlap = n_both /
      min(n_a, n_b) — the containment-style coefficient that stays
      meaningful when one vocabulary dwarfs the other; both 6dp;
    - pairs sharing no term still emit a row (n_both = 0) — absence
      of overlap IS the finding; groups are enumerated from the
      distinct-pair frame.

    Scale shape: one explode → ONE distinct (group, term) hash
    aggregation (map-side partials collapse the Zipf head), one
    group-size aggregation (dimension-sized), a TERM-co-partitioned
    self-join for intersections (fan-out per term = groups containing
    it — bounded by |groups|, never corpus size), and a |groups|²
    dimension cross join to restore zero-overlap pairs."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    from ai_etl_framework_spark.functions.text import tokens

    pairs = (
        df.where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
    )
    sizes = pairs.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("nv"))
    a = pairs.select(F.col("g").alias("ga"), "term")
    b = pairs.select(F.col("g").alias("gb"), "term")
    inter = (
        a.join(b, "term")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("g").alias("ga"), F.col("nv").alias("n_a"))
    sb = sizes.select(F.col("g").alias("gb"), F.col("nv").alias("n_b"))
    grid = sa.crossJoin(sb).where(F.col("ga") < F.col("gb"))
    out = grid.join(inter, ["ga", "gb"], "left").select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        "n_a",
        "n_b",
        F.coalesce("n_both", F.lit(0)).cast("long").alias("n_both"),
    )
    nb = F.col("n_both").cast("double")
    return out.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        "n_both",
        F.round(nb / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6).alias(
            "jaccard"
        ),
        F.round(nb / F.least("n_a", "n_b"), 6).alias("overlap"),
    )


def vocab_richness(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    r"""Vocabulary richness per group — Good–Turing unseen-probability
    mass and the bias-corrected Chao1 total-vocabulary estimate from
    singleton/doubleton counts: "how much vocabulary does this source
    still hide" — the capture-recapture answer to whether another
    crawl of the same source is worth it (the forward-looking
    complement of vocab_novelty's backward-looking curve). Good 1953;
    Chao 1984 (Chao1); Gale & Sampson 1995 for the GT reading.
    Beyond-reference analytics scope (grep 'good.turing\|chao' over
    /root/reference/src: zero hits).

    Pinned semantics (oracle-replicated):

    - tokens = the shared case-folded whitespace tokenizer; counts
      are token occurrences per (group, term); NULL groups drop;
    - n_tokens = Σ counts (N), vocab = distinct terms (V), n1/n2 =
      terms seen exactly once/twice;
    - unseen_mass = n1 / N (Good–Turing's P₀ estimate), 6dp;
    - chao1 = V + n1·(n1−1) / (2·(n2+1)) — the BIAS-CORRECTED form,
      defined even when n2 = 0 (the classic V + n1²/(2n2) is not),
      6dp;
    - groups with zero tokens emit no row (no evidence).

    Scale shape: one explode → ONE (group, term) hash aggregation
    (map-side partials collapse the Zipf head) → one group-level
    reduce over the vocab frame. Nothing text-scale past the first
    aggregation; no join, no window."""
    from ai_etl_framework_spark.functions.text import tokens

    counts = (
        df.where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
    n2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("double")
    v = F.count(F.lit(1)).cast("double")
    n = F.sum("c")
    return counts.groupBy(F.col("g").alias(group_col)).agg(
        n.cast("long").alias("n_tokens"),
        v.cast("long").alias("vocab"),
        n1.cast("long").alias("n_singletons"),
        n2.cast("long").alias("n_doubletons"),
        F.round(n1 / n, 6).alias("unseen_mass"),
        F.round(v + n1 * (n1 - 1.0) / (2.0 * (n2 + 1.0)), 6).alias("chao1"),
    )
