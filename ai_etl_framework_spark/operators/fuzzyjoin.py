"""Edit-distance string self-join — all pairs within Levenshtein
distance ``d`` (Ed-Join, Xiao et al. 2008: q-gram prefix filtering),
the record-linkage/data-cleaning classic (typo'd names, OCR noise,
near-identical product titles). Beyond-reference scope (the
reference's fuzzy dedup is embedding-cosine only,
deduplicator.py:235-257). The edit-distance sibling of dd04's PPJoin
(set-Jaccard).

EXACT contract (oracle = brute-force within-length-band levenshtein):
the output is every pair with ``levenshtein ≤ max_dist`` — the
filters only prune candidates, never results. Output
``(id_a, id_b, dist)`` with id_a < id_b; NULL strings produce no
rows.

Filter stack (all candidate-side):

1. **Length filter** — ed ≤ d ⇒ |len(a) − len(b)| ≤ d. Always on.
2. **Prefix filter (Ed-Join)** — one edit changes at most ``q``
   distinct q-grams, so ed ≤ d ⇒ |grams(a) \\ grams(b)| ≤ q·d; by
   the prefix-filtering principle (Chaudhuri 2006) two such strings
   must collide within their first ``q·d + 1`` grams under one
   GLOBAL rarity order (document frequency asc, gram asc — the dd04
   rarest-first trick). Corpus-wide boilerplate grams (shared
   prefixes like "Customer#00") have maximal frequency, sort LAST,
   and never enter a prefix — the hot-gram quadratic blowup prunes
   itself. Applies to strings with ≥ q·d + 1 DISTINCT grams (the
   principle is vacuous below that).
3. **Short/degenerate band** — strings with < q·d + 1 distinct
   grams (near-empty strings, and degenerate repeats like
   "aaaaaaaa" whose gram SET is tiny at any length) pair against
   every string within ``d`` of their length, via an equi-join on
   exploded target lengths (never a nested loop). Their count is
   capped fail-loud by ``max_short_rows`` — a corpus that trips it
   is a corpus of near-empty/degenerate strings; dedup those first.

Scale shape: the gram-frequency table is one hash aggregation
(vocab-sized); prefixes are a per-string top-(qd+1) via a rank
window Spark 4 executes as WindowGroupLimit; candidates join on the
GRAM value (rare grams → small buckets), dedup to distinct id pairs,
then ONE codegen levenshtein verify per candidate."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["fuzzy_string_pairs"]


def fuzzy_string_pairs(
    df: DataFrame,
    id_col: str,
    string_col: str,
    max_dist: int = 1,
    q: int = 2,
    max_short_rows: int = 100_000,
) -> DataFrame:
    """All (id_a, id_b, dist) with ``levenshtein ≤ max_dist``,
    id_a < id_b. See module contract."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    prefix_len = q * max_dist + 1

    base = df.select(
        F.col(id_col).alias("id"), F.col(string_col).alias("s")
    ).where(F.col("s").isNotNull())
    with_len = base.withColumn("len", F.length("s"))

    # distinct positional q-grams per string (set semantics — the
    # prefix principle above is stated on gram SETS)
    grams = with_len.where(F.col("len") >= q).select(
        "id",
        "len",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("len") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            )
        ).alias("g"),
    )
    gram_counts = grams.groupBy("id").agg(
        F.count(F.lit(1)).alias("__ng")
    )

    # --- long path: Ed-Join prefix filter --------------------------
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("id").orderBy(F.col("__df").asc(), F.col("g").asc())
    prefixes = (
        grams.join(
            gram_counts.where(F.col("__ng") >= prefix_len), "id"
        )
        .join(freq, "g")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= prefix_len)
        .select("id", "len", "g")
    )
    a = prefixes.select(F.col("id").alias("id_a"), F.col("len").alias("la"), "g")
    b = prefixes.select(F.col("id").alias("id_b"), F.col("len").alias("lb"), "g")
    cand_long = (
        a.join(b, "g")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
        )
        .select("id_a", "id_b")
    )

    # --- short/degenerate band --------------------------------------
    short = (
        with_len.join(gram_counts, "id", "left")
        .where(F.coalesce(F.col("__ng"), F.lit(0)) < prefix_len)
        .select("id", "len")
    )
    n_short = short.limit(max_short_rows + 1).count()
    if n_short > max_short_rows:
        raise ValueError(
            f"more than max_short_rows={max_short_rows} strings with fewer "
            f"than {prefix_len} distinct {q}-grams — the short/degenerate "
            "band pairs against every similar-length string; drop "
            "near-empty/degenerate strings first or raise the cap"
        )
    # equi-join on exploded target lengths (2d+1 keys per short row) —
    # a banded join, never a nested loop
    targets = short.select(
        F.col("id").alias("sid"),
        F.explode(
            F.sequence(F.col("len") - max_dist, F.col("len") + max_dist)
        ).alias("len"),
    )
    others = with_len.select(F.col("id").alias("oid"), "len")
    cand_short = (
        targets.join(others, "len")
        .where(F.col("sid") != F.col("oid"))
        .select(
            F.least("sid", "oid").alias("id_a"),
            F.greatest("sid", "oid").alias("id_b"),
        )
    )

    cand = cand_long.unionByName(cand_short).distinct()

    # --- verify: one codegen levenshtein per candidate --------------
    left = base.select(F.col("id").alias("id_a"), F.col("s").alias("__sa"))
    right = base.select(F.col("id").alias("id_b"), F.col("s").alias("__sb"))
    return (
        cand.join(left, "id_a")
        .join(right, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
