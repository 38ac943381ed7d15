#!/usr/bin/env python
"""dd04 at sf1: A/B the §2 shuffle sizing of the prefix self-join +
final distinct (VERDICT r13 item 4 — every sf0.1 lever measured null;
this is the 10x-data profile where exec dominates).

Arms (runtime-settable confs only, restored after):
  base     — the session defaults (shuffle.partitions = 32, AQE
             coalescing with parallelismFirst=true)
  parts128 — 4x initial reduce partitions (AQE may coalesce back;
             a win here would mean the 32-partition first wave was
             skew/straggler-bound — guide §2.5/§2.6)
  adv16m   — parallelismFirst=false + advisoryPartitionSizeInBytes=16m
             (partition count derived from runtime bytes; harmful at
             sf0.1 — re-tested where the shuffles are 10x bigger)

noop-forced (scale_smoke convention), order-rotated, medians.
Usage: python scripts/ab_dd04_sf1_shuffle.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF1 = os.environ.get("SCALE_SMOKE_DIR", "/tmp/sf1_scale_smoke")

ARMS: list[tuple[str, dict[str, str]]] = [
    ("base", {}),
    ("parts128", {"spark.sql.shuffle.partitions": "128"}),
    ("adv16m", {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    }),
]


def main() -> None:
    import __spark_entry__ as entrymod
    from scripts.scale_smoke import build_sf1
    from ai_etl_framework_spark.session import get_spark, load_table

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab_dd04_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(SF1, "documents.parquet")):
        print(f"building sf1 dir at {SF1} ...", file=sys.stderr)
        build_sf1(spark, SF1)
    load_table(spark, SF1, "documents").count()

    defaults = {k: spark.conf.get(k) for _, c in ARMS for k in c}

    def run(conf: dict[str, str]) -> float:
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            t0 = time.perf_counter()
            df = entrymod.dd04_ngram_jaccard(spark, SF1)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        finally:
            for k in conf:
                spark.conf.set(k, defaults[k])

    for name, conf in ARMS:  # codegen warm each arm once
        run(conf)
    t: dict[str, list[float]] = {n: [] for n, _ in ARMS}
    for r in range(reps):
        order = ARMS if r % 2 == 0 else list(reversed(ARMS))
        for name, conf in order:
            t[name].append(run(conf))
    for name, _ in ARMS:
        xs = t[name]
        print(f"{name:10s} median={statistics.median(xs):6.3f}s "
              f"sd={statistics.stdev(xs):5.3f} runs="
              f"{['%.2f' % x for x in xs]}")
    spark.stop()


if __name__ == "__main__":
    main()
