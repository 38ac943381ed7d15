#!/usr/bin/env python
"""Capture the r13 before/after plans for the ONE plan-shape change of
commit c05bae5 (p03/p04 streaming backfills): the scratch bronze write
gained a round-robin repartition so the single-split events input no
longer parquet-encodes on one core.

The streaming query itself (sessionize_stream over the file source) is
plan-identical before and after — the emit_frame change is Python work
INSIDE the FlatMapGroupsInPandasWithState node — so both files carry
the same streaming plan; the diff is confined to the bronze-write
input frame (0 Exchange -> 1 Exchange RoundRobinPartitioning).

Usage: python scripts/capture_p03_plans_r13.py
Writes plans/r13/p03_streaming_sessions_{before,after}.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    import tempfile

    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.session import get_spark
    from ai_etl_framework_spark.streaming.events import read_stream
    from ai_etl_framework_spark.streaming.sessions import sessionize_stream

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    spark = get_spark(app_name="capture_p03_plans_r13")
    spark.sparkContext.setLogLevel("ERROR")

    ev = entrymod.load_table(spark, SF_DIR, "events")
    before_write = ev  # pre-c05bae5: bare ev.write -> one encode task
    after_write = ev.repartition(
        min(8, spark.sparkContext.defaultParallelism)
    )

    # the streaming plan (identical pre/post): sessionize over a file
    # source pointed at a scratch bronze dir of the same schema
    with tempfile.TemporaryDirectory(prefix="p03_plan_") as tmp:
        bronze = os.path.join(tmp, "bronze")
        ev.limit(1).write.mode("overwrite").parquet(bronze)
        stream_df = sessionize_stream(
            read_stream(spark, bronze, fmt="parquet", schema=ev.schema),
            gap_minutes=30.0,
            watermark="0 seconds",
        )
        stream_plan = _formatted(stream_df)

    for tag, wdf in (("before", before_write), ("after", after_write)):
        path = os.path.join(out_dir, f"p03_streaming_sessions_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                "== p03 backfill, bronze-write input frame "
                f"({tag} c05bae5) ==\n"
            )
            fh.write(_formatted(wdf))
            fh.write(
                "\n\n== streaming sessionize plan (identical before/after"
                " c05bae5; emit_frame change is Python work inside the"
                " stateful node) ==\n"
            )
            fh.write(stream_plan)
        print(f"wrote {path}")

    spark.stop()


if __name__ == "__main__":
    main()
