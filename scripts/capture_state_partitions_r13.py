#!/usr/bin/env python
"""Capture before/after evidence for the r13 size-derived
state-partition change in ``_run_stream_once``
(``_backfill_state_partitions``): the streaming backfill's state
exchange drops from defaultParallelism (32 here) state partitions to
the input-size-derived count (16 at sf0.1's 2 MB events bronze).

Evidence captured per arm, into
``plans/r13/p04_state_partitions_{before,after}.txt``:
- the checkpoint offsets log's ``spark.sql.shuffle.partitions`` entry
  (the number of RocksDB state stores each micro-batch opens/commits
  — baked into the checkpoint at query start);
- the executed micro-batch physical plan (StreamingQuery.explain on
  the terminated query — shows the StateStoreSave exchange);
- the backfill wall-clock (median of 3, fresh checkpoint each run).

"before" is reproduced by pinning SPARK_GRAFT_STATE_PART_BYTES=1 so
the derivation saturates at the cap — exactly the old pinned
defaultParallelism behavior.

Usage: python scripts/capture_state_partitions_r13.py
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.session import get_spark, load_table
    from ai_etl_framework_spark.streaming.events import (
        read_stream,
        windowed_counts,
    )

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_state_partitions_r13")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, SF_DIR, "events")

    def one_run(nparts: int):
        """One p04-style backfill at a pinned state-partition count;
        returns (seconds, offsets-log conf line, executed plan)."""
        tmp = tempfile.mkdtemp(prefix="cap_state_")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
            bronze = os.path.join(tmp, "bronze")
            out = os.path.join(tmp, "out")
            ckpt = os.path.join(tmp, "ckpt")
            ev.repartition(8).write.mode("overwrite").parquet(bronze)
            t0 = time.perf_counter()
            sink = windowed_counts(
                read_stream(spark, bronze, fmt="parquet", schema=ev.schema),
                ts_col="ts", window="1 hour", watermark="2 hours",
                group_cols=["event_type"],
            )
            q = (
                sink.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
            dt = time.perf_counter() - t0
            with open(os.path.join(ckpt, "offsets", "0")) as fh:
                lines = fh.read().splitlines()
            conf_line = ""
            for ln in lines:
                if ln.startswith("{") and "shuffle.partitions" in ln:
                    meta = json.loads(ln)
                    sp = meta.get("conf", {}).get(
                        "spark.sql.shuffle.partitions"
                    )
                    conf_line = (
                        f'offsets-log conf "spark.sql.shuffle.partitions"'
                        f": {sp}"
                    )
            buf = io.StringIO()
            with redirect_stdout(buf):
                q.explain()
            return dt, conf_line, buf.getvalue()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(tmp, ignore_errors=True)

    derived = entrymod._backfill_state_partitions
    # derive the "after" count the production code computes for this
    # input (writes its own scratch bronze to measure bytes)
    tmp = tempfile.mkdtemp(prefix="cap_state_probe_")
    try:
        bronze = os.path.join(tmp, "bronze")
        ev.repartition(8).write.mode("overwrite").parquet(bronze)
        n_after = derived(spark, bronze)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    n_before = spark.sparkContext.defaultParallelism

    for tag, nparts in (("before", n_before), ("after", n_after)):
        one_run(nparts)  # warm
        results = [one_run(nparts) for _ in range(3)]
        med = sorted(results, key=lambda r: r[0])[1]
        path = os.path.join(out_dir, f"p04_state_partitions_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"p04 windowed-streaming backfill, sf0.1, {tag} the r13\n"
                f"size-derived state-partition change "
                f"(_backfill_state_partitions).\n"
                f"state partitions = {nparts} "
                f"({'pinned defaultParallelism (old behavior)' if tag == 'before' else 'derived: ceil(bronze_bytes / 128KiB), clamped [4, defaultParallelism]'})\n"
                f"{med[1]}\n"
                f"backfill wall-clock (median of 3, fresh checkpoint): "
                f"{med[0]:.2f} s  (all runs: "
                f"{', '.join(f'{r[0]:.2f}' for r in results)})\n\n"
                f"executed micro-batch plan (StreamingQuery.explain):\n\n"
                f"{med[2]}"
            )
        print(f"{tag}: parts={nparts} median {med[0]:.2f}s -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
