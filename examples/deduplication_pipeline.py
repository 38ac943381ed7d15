"""Mirror of the reference's examples/deduplication_pipeline.py:
exact dedup (MD5-keyed, keep_first in input order) and minhash-LSH
near-dup removal over the documents test table.

Run: python examples/deduplication_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_etl_framework_spark.operators import Deduplicator
from ai_etl_framework_spark.operators.dedup import minhash_dedup
from ai_etl_framework_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="example-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()

    # exact: same text -> keep the first occurrence (input order = doc_id)
    exact = Deduplicator(match_mode="exact", match_fields=["text"], order_col="doc_id")
    n_exact = exact(docs).count()

    # near-dup: minhash LSH candidates -> exact Jaccard >= 0.8 verify
    n_near = minhash_dedup(docs, "doc_id", "text", threshold=0.8).count()

    print(f"{n} docs: {n_exact} after exact dedup; {n_near} after near-dup removal")
    # NB: near <= exact is NOT an invariant — zero-token docs carry no
    # minhash signature, so exact dups of blank texts survive the
    # near-dup pass but not exact dedup. Each pass only shrinks the
    # corpus it actually ran on:
    assert n_exact <= n and n_near <= n


if __name__ == "__main__":
    main()
