"""Collocation mining — corpus bigram PMI (pointwise mutual
information): the phrase-mining primitive ("new york", "machine
learning") every tokenizer-vocabulary and corpus-analysis pipeline
wants next to raw token counts (txt09). Standard PMI (Church & Hanks
1990): PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ). Beyond-reference scope
(grep pmi/collocation over /root/reference/src: zero hits).

Pinned semantics (oracle-replicated):

- tokens = the shared case-folded whitespace tokenizer
  (functions/text.tokens — one definition, one SQL twin fragment);
- bigrams = adjacent token pairs WITHIN a document (never across
  document boundaries); documents with <2 tokens contribute none;
- p(a,b) = c(a,b) / N_bigrams; p(a) = c(a) / N_tokens, both corpus
  totals — the textbook estimator (unigram and bigram event spaces
  differ by |docs|; that constant offsets ALL scores equally and is
  part of the pinned definition);
- output: (w1, w2, n_pair, pmi) for pairs with c(a,b) ≥ min_count,
  top_k by (pmi 6dp DESC, w1 ASC, w2 ASC) — ordering on the ROUNDED
  score so the cut is engine-stable; pmi rounded 6dp.

Scale shape: one explode → ONE pair hash aggregation (map-side
partials collapse the Zipf head), one token hash aggregation, then
the pair frame joins the unigram-count frame twice ON THE WORD (the
tfidf unhinted-join contract: vocabulary-sized, AQE decides broadcast
vs shuffle) and a 2-scalar cross join. min_count prunes BEFORE the
joins, so only frequent pairs move."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pmi_collocations", "log_odds_terms", "zipf_fit"]


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """(w1, w2, n_pair, pmi) — module pins."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from ai_etl_framework_spark.functions.text import tokens

    t = tokens(F.col(text_col))
    toks = df.select(t.alias("__t"))
    n = F.size("__t")
    pairs = toks.where(n >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at("__t", i).alias("w1"),
                    F.element_at("__t", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    unis = toks.select(F.explode("__t").alias("w"))
    uni_counts = unis.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = unis.agg(F.count(F.lit(1)).alias("n_tok")).crossJoin(
        pairs.agg(F.count(F.lit(1)).alias("n_bi"))
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    ca = uni_counts.select(F.col("w").alias("w1"), F.col("c").alias("__ca"))
    cb = uni_counts.select(F.col("w").alias("w2"), F.col("c").alias("__cb"))
    scored = (
        pair_counts.join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_bi"))
                    / (
                        (F.col("__ca") / F.col("n_tok"))
                        * (F.col("__cb") / F.col("n_tok"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_k)


def log_odds_terms(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 10,
    prior_strength: float = 10.0,
) -> DataFrame:
    """Distinctive terms per group — Monroe/Colaresi/Quinn (2008)
    weighted log-odds with an informative Dirichlet prior: for each
    group, which terms are over-represented vs the REST of the
    corpus, z-scored so rare-term noise doesn't dominate (the failure
    mode of raw PMI/tf-idf "top terms"). The "what does each source
    talk about" readout corpus cards want next to vocab counts.

    Pinned semantics (oracle-replicated):
    - tokens = the shared case-folded whitespace tokenizer (the PMI
      contract); counts are TOKEN occurrences per (group, term);
      NULL groups drop;
    - prior α_w = prior_strength · c(w)/N (the corpus distribution
      scaled to ``prior_strength`` pseudo-tokens), α₀ =
      prior_strength exactly;
    - δ_gw = ln((y_gw+α_w)/(n_g+α₀−y_gw−α_w))
             − ln((y_rw+α_w)/(n_r+α₀−y_rw−α_w)) with r = all other
      groups; z = δ/√(1/(y_gw+α_w) + 1/(y_rw+α_w));
    - terms with corpus count < min_count are pruned BEFORE scoring;
      ALL totals (corpus N, group n_g, rest n_r) are computed over
      the PRUNED vocabulary so they are mutually consistent (Monroe
      et al.'s convention; mixed totals can drive n_r negative);
      rows where any log argument is ≤ 0 drop (single-term-corpus
      degeneracy, pinned);
    - output: top_k per group by (z 6dp DESC, term ASC) — the cut
      compares the ROUNDED score (engine-stable); (group, term,
      n_group, n_rest, z).

    Scale shape: one explode → ONE (group, term) hash aggregation
    (map-side partials collapse the Zipf head); the term-total and
    group-total frames are vocab-/group-sized; joins follow the PMI
    unhinted-join contract; the top-k is WindowGroupLimit over the
    (groups × vocab) frame."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if prior_strength <= 0:
        raise ValueError(
            f"prior_strength must be > 0, got {prior_strength}"
        )
    from pyspark.sql import Window

    from ai_etl_framework_spark.functions.text import tokens

    cells = (
        df.where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    term_tot = (
        cells.groupBy("term")
        .agg(F.sum("y").alias("cw"))
        .where(F.col("cw") >= min_count)
    )
    pruned = cells.join(term_tot, "term")
    # Group totals over the PRUNED vocabulary so n (corpus total) and
    # ng share one vocabulary — Monroe et al.'s totals are consistent;
    # mixed totals let nr = n - ng go negative for rare-term-heavy
    # groups and the positivity guard then silently dropped rows
    # (r10 ADVICE finding).
    group_tot = pruned.groupBy("g").agg(F.sum("y").alias("ng"))
    n_total = F.sum("cw")
    totals = term_tot.agg(n_total.alias("n")).collect()[0]
    n = float(totals["n"])
    a0 = float(prior_strength)
    scored = pruned.join(F.broadcast(group_tot), "g").select(
        "g",
        "term",
        "y",
        "ng",
        (F.col("cw") * F.lit(a0 / n)).alias("aw"),
        (F.col("cw") - F.col("y")).alias("yr"),
        (F.lit(n) - F.col("ng")).alias("nr"),
    )
    num_g = F.col("y") + F.col("aw")
    den_g = F.col("ng") + F.lit(a0) - F.col("y") - F.col("aw")
    num_r = F.col("yr") + F.col("aw")
    den_r = F.col("nr") + F.lit(a0) - F.col("yr") - F.col("aw")
    delta = F.log(num_g / den_g) - F.log(num_r / den_r)
    z = delta / F.sqrt(1.0 / num_g + 1.0 / num_r)
    ranked = (
        scored.where((den_g > 0) & (den_r > 0) & (num_r > 0))
        .select(
            F.col("g").alias(group_col),
            "term",
            F.col("y").cast("long").alias("n_group"),
            F.col("yr").cast("long").alias("n_rest"),
            F.round(z, 6).alias("z"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(
                    F.col("z").desc(), F.col("term").asc()
                )
            ),
        )
    )
    return ranked.where(F.col("rank") <= top_k).drop("rank")


def zipf_fit(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit per group — OLS of ln(frequency) on
    ln(rank) over each group's top terms: the corpus-linguistics
    health check ("natural text slopes ≈ −1; templated or synthetic
    text bends") that corpus cards report next to vocabulary size and
    novelty. Beyond-reference analytics scope (grep 'zipf' over
    /root/reference/src: zero hits). Zipf 1949; Piantadosi 2014 for
    the diagnostics reading.

    Pinned semantics (oracle-replicated):

    - tokens = the shared case-folded whitespace tokenizer (the PMI
      contract); counts are token occurrences per (group, term);
      NULL groups drop;
    - rank = row_number per group ordered by (count DESC, term ASC) —
      a deterministic total order, so both engines cut the SAME
      top_n set even through count ties;
    - the fit uses terms with rank <= top_n AND count >= min_count
      (the Zipf tail below min_count is noise, and capping at top_n
      keeps the regression frame dimension-bounded);
    - slope/intercept/r2 = the engines' own ANSI regr_* aggregates
      over (x = ln(rank), y = ln(count)), rounded 6dp; groups with
      < 3 usable terms or zero x-variance yield NULL fit columns
      (ANSI regr semantics — never a division error);
    - output: (group, n_terms, slope, intercept, r2).

    Scale shape: one explode → ONE (group, term) hash aggregation
    (map-side partials collapse the Zipf head — the head IS the
    subject here), a per-group rank window the optimizer bounds via
    WindowGroupLimit (rank <= top_n filter), then ONE regr
    aggregation over ≤ groups × top_n rows. Nothing text-scale past
    the first aggregation."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_n < 3:
        raise ValueError(f"top_n must be >= 3, got {top_n}")
    from pyspark.sql import Window

    from ai_etl_framework_spark.functions.text import tokens

    counts = (
        df.where(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("g").orderBy(
                F.col("y").desc(), F.col("term").asc()
            )
        ),
    ).where((F.col("rank") <= top_n) & (F.col("y") >= min_count))
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("y"))
    return ranked.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.regr_slope(ly, lx), 6).alias("slope"),
        F.round(F.regr_intercept(ly, lx), 6).alias("intercept"),
        F.round(F.regr_r2(ly, lx), 6).alias("r2"),
    )
