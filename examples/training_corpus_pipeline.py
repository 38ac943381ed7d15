"""End-to-end LLM training-corpus pipeline over the documents table —
the full modern (FineWeb/Dolma/CCNet-style) stage order:

  1. HTML → text extraction (strip_html; a no-op on plain text), then
     text normalization (clean_text: control chars, unicode spaces,
     whitespace runs)
  2. corpus-level boilerplate removal (repeated-line dedup — nav bars
     and cookie banners per-document scoring cannot see)
  3. text statistics + language ID + heuristic quality score
  4. quality gate (drop low-quality / too-short docs)
  5. exact dedup (md5 on normalized text, keep first)
  6. near-dup removal (MinHash-LSH candidates, exact-Jaccard verify)
  7. CCNet perplexity gate: fit a bigram reference LM on a
     deterministic hash-sample of the deduped corpus, bucket every
     document head/middle/tail by corpus-level perplexity quantiles,
     drop the tail (no-bigram docs pass — "no evidence")
  8. per-language stratified cap (deterministic hash rank)
  9. train/val/test hash split (leak-proof: membership is a pure
     function of doc_id)
  7b. DSIR selection (Xie 2023): keep the corpus fraction whose
     hashed-n-gram profile best matches a high-quality target slice
     (here: the top-quality documents themselves), via the
     quantile-threshold form (scales past driver top-k)
 10. greedy token-bin packing of the train split (bucket-parallel)
 11. per-language dataset card (corpus_report) for observability
 12. tokenizer prep: BPE merge table trained on the train split's
     word counts + real per-document token counts (distinct-word
     encode — the merge loop never sees the corpus)

Every membership decision is hash-deterministic, so re-running on a
grown corpus never flips yesterday's sample/split. Plan construction
is lazy EXCEPT the two bounded driver scalars the CCNet stage needs
(the LM vocabulary size and the two perplexity cut points) — the same
bounded-collect contract as the operators themselves.

Run: python examples/training_corpus_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from ai_etl_framework_spark.functions.text import (
    bpe_token_estimate,
    clean_text,
    lang_id,
    quality_score,
    strip_html,
    token_count,
)
from ai_etl_framework_spark.operators.bpe import (
    bpe_token_counts,
    merge_table_df,
    train_bpe_merges,
    word_counts,
)
from ai_etl_framework_spark.operators.dsir import dsir_select_frac
from ai_etl_framework_spark.operators.corpus import (
    corpus_report,
    repeated_line_dedup,
)
from ai_etl_framework_spark.operators.dedup import minhash_dedup
from ai_etl_framework_spark.operators.lm import (
    fit_bigram_lm,
    perplexity_buckets,
)
from ai_etl_framework_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    pack_documents,
    stratified_quota,
)
from ai_etl_framework_spark.operators import Deduplicator
from ai_etl_framework_spark.session import get_spark, load_table


def build_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    per_lang_cap: int = 10_000,
    max_pack_tokens: int = 2048,
    boilerplate_min_count: int = 5,
    lm_sample_frac: float = 0.2,
    drop_ppl_bucket: str | None = "tail",
    dsir_frac: float | None = None,
    n_bpe_merges: int = 64,
) -> dict[str, DataFrame]:
    """Returns {"annotated", "train_packs", "val", "test", "report"}
    DataFrames. ``drop_ppl_bucket=None`` skips the CCNet stage (and
    its two bounded driver collects) entirely."""
    cleaned = docs.select(
        "doc_id", clean_text(strip_html(F.col("text"))).alias("text")
    )
    unboiler = repeated_line_dedup(
        cleaned, min_count=boilerplate_min_count
    ).select("doc_id", F.col("clean_text").alias("text"))
    annotated = unboiler.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_estimate(F.col("text")).alias("n_bpe"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("quality"),
    )
    gated = annotated.where(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    exact = Deduplicator(
        match_mode="exact", match_fields=["text"], order_col="doc_id"
    )(gated)
    near = minhash_dedup(exact, "doc_id", "text", threshold=0.8)
    if drop_ppl_bucket is not None:
        # CCNet stage: the reference LM is a deterministic hash-sample
        # of the deduped corpus itself (monotone: growing the corpus
        # keeps yesterday's sample inside today's)
        lm = fit_bigram_lm(
            deterministic_sample(near, "doc_id", lm_sample_frac, salt="lm")
        )
        buckets = perplexity_buckets(near, lm)
        keep_ids = buckets.where(
            F.col("ppl_bucket").isNull()  # no bigrams: no evidence
            | (F.col("ppl_bucket") != drop_ppl_bucket)
        ).select("doc_id")
        near = near.join(keep_ids, "doc_id", "left_semi")
    if dsir_frac is not None:
        # DSIR: the target distribution is the corpus's own top-quality
        # slice — deterministic, no external dependency; the quantile-
        # threshold form never materializes a driver-side top-k
        target = near.orderBy(F.col("quality").desc(), "doc_id").limit(
            max(50, int(near.count() * 0.1))
        )
        near = dsir_select_frac(
            near, target, frac=dsir_frac, id_col="doc_id"
        ).drop("dsir_key")
    capped = stratified_quota(near, "lang", "doc_id", per_lang_cap)
    split = hash_split(capped, "doc_id", (0.9, 0.05, 0.05), ("train", "val", "test"))
    train = split.where(F.col("split") == "train")
    packs = pack_documents(train, "doc_id", "n_bpe", max_pack_tokens)
    # tokenizer prep on what actually ships: the merge loop runs on
    # the vocab-sized word table; token counting joins the encoded
    # distinct words back (the corpus never enters Python)
    merges = train_bpe_merges(word_counts(train), n_merges=n_bpe_merges)
    return {
        "annotated": annotated,
        "train_packs": packs,
        "bpe_merges": merge_table_df(docs.sparkSession, merges),
        "train_token_counts": bpe_token_counts(train, merges),
        "val": split.where(F.col("split") == "val"),
        "test": split.where(F.col("split") == "test"),
        # per-language dataset card of what actually ships
        "report": corpus_report(capped, source_col="lang", lang_col="lang"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="example-training-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    out = build_corpus(docs, dsir_frac=0.9)

    n = docs.count()
    packs = out["train_packs"].cache()
    n_train = packs.count()
    n_packs = packs.select("pack_id").distinct().count()
    fill = packs.groupBy("pack_id").agg(F.first("pack_tokens").alias("t"))
    avg_fill = fill.agg(F.avg("t")).first()[0]
    print(
        f"{n} raw docs -> {n_train} train docs in {n_packs} packs "
        f"(avg fill {avg_fill:.0f}/2048 tokens); "
        f"val={out['val'].count()} test={out['test'].count()}"
    )
    for r in out["report"].orderBy("lang").collect():
        print(
            f"  lang={r['lang']}: {r['n_docs']} docs, "
            f"{r['total_tokens']} tokens, dup_rate={r['dup_rate']}"
        )
    n_merges = out["bpe_merges"].count()
    tok = out["train_token_counts"].agg(
        F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w")
    ).first()
    print(
        f"tokenizer: {n_merges} BPE merges; train split = "
        f"{tok['t']} tokens over {tok['w']} words"
    )
    with tempfile.TemporaryDirectory(prefix="corpus_") as tmp:
        packs.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(tmp, "train_packs")
        )
        n_buckets = sum(
            1 for e in os.listdir(os.path.join(tmp, "train_packs"))
            if e.startswith("bucket=")
        )  # the dir also holds _SUCCESS and its .crc sidecar
        print("wrote", n_buckets, "bucket partitions")


if __name__ == "__main__":
    main()
