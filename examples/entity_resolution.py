"""End-to-end entity resolution — the full MDM loop composed from the
engine's own primitives, nothing bespoke:

1. **Candidate pairs** — Ed-Join q-gram prefix-filtered edit-distance
   self-join over customer names (operators/fuzzyjoin.py, the x38
   operator): only strings sharing a rare q-gram ever meet, one
   codegen levenshtein per surviving candidate.
2. **Clusters** — pointer-jumping connected components over the pair
   graph (operators/dedup.py connected_component_labels, the q24
   machinery): min-id labels, fail-loud round budget.
3. **Golden records** — per-COLUMN survivorship over each cluster
   (operators/survivorship.py golden_record, the x55 operator):
   modal segment, max balance — the consolidation a whole-row
   keep_first cannot express.

Every stage is individually oracle-verified (x38 / q24 / x55); this
example pins their COMPOSITION end to end and prints the resolved
entity table.

Run: python examples/entity_resolution.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_etl_framework_spark.operators.dedup import connected_component_labels
from ai_etl_framework_spark.operators.fuzzyjoin import fuzzy_string_pairs
from ai_etl_framework_spark.operators.survivorship import golden_record
from ai_etl_framework_spark.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def resolve_entities(cust, max_dist: int = 1):
    """customer frame → (golden entity table, n_clusters). The id of
    each resolved entity is its cluster's minimum c_custkey."""
    pairs = fuzzy_string_pairs(cust, "c_custkey", "c_name", max_dist=max_dist)
    labels = connected_component_labels(
        pairs.select(F.col("id_a"), F.col("id_b"))
    )
    labeled = cust.join(
        labels.withColumnRenamed("id", "c_custkey"), "c_custkey", "left"
    ).withColumn("entity_id", F.coalesce("label", "c_custkey"))
    golden = golden_record(
        labeled,
        "entity_id",
        {
            "c_name": "min",            # canonical-smallest name
            "c_mktsegment": "mode",     # most frequent segment
            "c_acctbal": "max",         # best-known balance
        },
    )
    return golden, labeled.select("entity_id").distinct().count()


def main() -> None:
    spark = get_spark(app_name="example-entity-resolution")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, SF_DIR, "customer")
    golden, n_entities = resolve_entities(cust)
    n_rows = cust.count()
    print(f"{n_rows} customer rows -> {n_entities} resolved entities")
    golden.orderBy("entity_id").show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
