"""End-to-end LLM training-corpus pipeline over the documents table:

  1. text statistics + language ID + heuristic quality score
  2. quality gate (drop low-quality / too-short docs)
  3. exact dedup (md5 on normalized text, keep first)
  4. near-dup removal (MinHash-LSH candidates, exact-Jaccard verify)
  5. per-language stratified cap (deterministic hash rank)
  6. train/val/test hash split (leak-proof: membership is a pure
     function of doc_id)
  7. greedy token-bin packing of the train split (bucket-parallel)
  8. write train packs partitioned by pack bucket

Every step is a declarative DataFrame transform — one lazy plan until
the final writes — and every membership decision is hash-deterministic
so re-running on a grown corpus never flips yesterday's sample/split.

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
    lang_id,
    quality_score,
    token_count,
)
from ai_etl_framework_spark.operators.dedup import minhash_dedup
from ai_etl_framework_spark.operators.sampling import (
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
) -> dict[str, DataFrame]:
    """Returns {"annotated", "train_packs", "val", "test"} DataFrames.
    Pure plan construction — nothing executes until the caller acts."""
    annotated = docs.select(
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
    capped = stratified_quota(near, "lang", "doc_id", per_lang_cap)
    split = hash_split(capped, "doc_id", (0.9, 0.05, 0.05), ("train", "val", "test"))
    train = split.where(F.col("split") == "train")
    packs = pack_documents(train, "doc_id", "n_bpe", max_pack_tokens)
    return {
        "annotated": annotated,
        "train_packs": packs,
        "val": split.where(F.col("split") == "val"),
        "test": split.where(F.col("split") == "test"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="example-training-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    out = build_corpus(docs)

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
