#!/usr/bin/env python
"""Decompose st01's sf1 COLD backfill (VERDICT r13 item 5: the sf1
smoke reads st01 cold at ~7x of sf0.1 — how much is checkpoint/RocksDB
spin-up, and does the size-derived state-partition count have the
right cap at 10x data?).

Replicates _run_stream_once's harness with the query object exposed so
the per-micro-batch `recentProgress` (triggerExecution, addBatch,
stateOperators commit times) can be read, and A/Bs the state-partition
count at sf1 (the derived value saturates the 32 cap there; 16/8
arms say whether the cap is right). Phases timed separately: bronze
write, stream execution, terminal read.

Usage: python scripts/profile_st01_sf1.py [arms...]   (default 32 16 8)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SCALE_SMOKE_DIR", "/tmp/sf1_scale_smoke")


def run_once(spark, ev, parts: int) -> dict:
    from ai_etl_framework_spark.streaming.events import read_stream
    from ai_etl_framework_spark.streaming.sessions import sessionize_stream

    tmp = tempfile.mkdtemp(prefix="st01_prof_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    out: dict = {"parts": parts}
    try:
        bronze = os.path.join(tmp, "bronze")
        sink = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        t0 = time.perf_counter()
        ev.repartition(
            min(8, spark.sparkContext.defaultParallelism)
        ).write.mode("overwrite").parquet(bronze)
        out["bronze_s"] = time.perf_counter() - t0

        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.perf_counter()
        q = (
            sessionize_stream(
                read_stream(spark, bronze, fmt="parquet", schema=ev.schema),
                gap_minutes=30.0, watermark="0 seconds",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("st01 sf1 backfill >600s")
        out["stream_s"] = time.perf_counter() - t0
        batches = []
        for p in q.recentProgress:
            d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
            pj = p if isinstance(p, dict) else json.loads(p.json)
            st = pj.get("stateOperators") or [{}]
            batches.append({
                "batchId": pj.get("batchId"),
                "rows": pj.get("numInputRows"),
                "triggerExecution_ms": d.get("triggerExecution"),
                "addBatch_ms": d.get("addBatch"),
                "commit_ms": (st[0].get("customMetrics", {}) or {}).get(
                    "rocksdbCommitLatencyMs"
                ) if st else None,
            })
        out["batches"] = batches
        t0 = time.perf_counter()
        n = spark.read.parquet(sink).count()
        out["read_s"] = time.perf_counter() - t0
        out["rows_out"] = n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    from scripts.scale_smoke import build_sf1
    from ai_etl_framework_spark.session import get_spark, load_table

    arms = [int(a) for a in sys.argv[1:]] or [32, 16, 8]
    spark = get_spark(app_name="profile_st01_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(SF1, "events.parquet")):
        print(f"building sf1 dir at {SF1} ...", file=sys.stderr)
        build_sf1(spark, SF1)
    ev = load_table(spark, SF1, "events")
    ev.count()

    # derived value for reference
    import __spark_entry__ as entrymod
    tmpb = tempfile.mkdtemp(prefix="st01_derive_")
    try:
        ev.repartition(8).write.mode("overwrite").parquet(tmpb)
        derived = entrymod._backfill_state_partitions(spark, tmpb)
        bronze_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(tmpb) for f in fs
            if not f.startswith((".", "_"))
        )
    finally:
        shutil.rmtree(tmpb, ignore_errors=True)
    print(f"sf1 bronze bytes={bronze_bytes/1e6:.1f} MB, derived state "
          f"partitions={derived}")

    # one untimed warm pass (codegen/JIT), then 3 reps per arm rotated
    run_once(spark, ev, arms[0])
    series: dict[int, list[dict]] = {a: [] for a in arms}
    for r in range(3):
        order = arms if r % 2 == 0 else list(reversed(arms))
        for a in order:
            series[a].append(run_once(spark, ev, a))
    for a in arms:
        ss = [x["stream_s"] for x in series[a]]
        bs = [x["bronze_s"] for x in series[a]]
        med = statistics.median(ss)
        print(f"parts={a:3d} stream median={med:6.2f}s "
              f"(runs {['%.2f' % x for x in ss]}) bronze median="
              f"{statistics.median(bs):5.2f}s rows={series[a][0]['rows_out']}")
        for b in series[a][0]["batches"]:
            print(f"    batch {b['batchId']}: rows={b['rows']} "
                  f"trigger={b['triggerExecution_ms']}ms "
                  f"addBatch={b['addBatch_ms']}ms commit={b['commit_ms']}")
    spark.stop()


if __name__ == "__main__":
    main()
