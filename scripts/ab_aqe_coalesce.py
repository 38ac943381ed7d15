#!/usr/bin/env python
"""A/B `spark.sql.adaptive.coalescePartitions.parallelismFirst` on the
batch bench rows (VERDICT r13 item 6, guide §2.2).

With parallelismFirst=true (Spark's default) AQE coalesces
post-shuffle partitions only down to
`coalescePartitions.minPartitionSize` (1 MB), keeping ~parallelism
partitions regardless of data size; with false it respects
`advisoryPartitionSizeInBytes`, i.e. the partition COUNT derives from
the actual shuffle bytes at runtime — the Spark docs themselves
recommend false ("it's recommended to set this config to false and
respect the configured target size"). The r13 c8 scaling block showed
every batch row is scheduling-overhead-bound at 32 partitions for
~25 MB inputs, so fewer post-shuffle partitions should win locally
AND be the right at-scale setting (guide §2.2: fewer, larger
partitions). The risk to measure: CPU-heavy post-shuffle stages
(dd03/dd04 verify joins) losing parallelism.

Interleaved, order-rotated, warm medians. Usage:
    python scripts/ab_aqe_coalesce.py [reps] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "q01_pricing_summary", "q02_filter_spec", "q03_join_revenue",
    "q07_agg_semantics", "q12_dedup_exact", "q13_rollup_by_date",
    "q16_pivot_flag_qty", "q17_window_events",
    "dd03_minhash_band_pairs", "dd04_ngram_jaccard",
]

CONF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.session import get_spark, load_table

    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 7
    only = set(a for a in args if not a.isdigit())
    names = [n for n in QUERIES if not only or any(n.startswith(o) for o in only)]

    spark = get_spark(app_name="ab_aqe_coalesce")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "events", "documents", "customer",
              "nation", "region", "supplier", "part"):
        load_table(spark, SF_DIR, t).count()
    qs = {n: getattr(entrymod, n) for n in names}
    for n in names:  # codegen warm both arms
        for v in ("true", "false"):
            spark.conf.set(CONF, v)
            qs[n](spark, SF_DIR).toPandas()

    print(f"{'query':28s} {'pFirst=true':>12s} {'pFirst=false':>13s} "
          f"{'delta%':>7s}  (medians of {reps}, interleaved)")
    for n in names:
        t = {"true": [], "false": []}
        for r in range(reps):
            order = ("true", "false") if r % 2 == 0 else ("false", "true")
            for v in order:
                spark.conf.set(CONF, v)
                t0 = time.perf_counter()
                qs[n](spark, SF_DIR).toPandas()
                t[v].append(time.perf_counter() - t0)
        mt = statistics.median(t["true"])
        mf = statistics.median(t["false"])
        sd = max(statistics.stdev(t["true"]), statistics.stdev(t["false"]))
        print(f"{n:28s} {mt:12.3f} {mf:13.3f} {100*(mf-mt)/mt:6.1f}%  "
              f"sd={sd:.3f}")
    spark.conf.set(CONF, "true")
    spark.stop()


if __name__ == "__main__":
    main()
