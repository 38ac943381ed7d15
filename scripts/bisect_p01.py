"""r8 verdict item 3: bisect the p01 throughput move (274k -> 244k
rec/s driver median). Hypothesis from the verdict: 32d4380 turned
spill compression back ON in local mode. p01 is a narrow
clean -> score -> parquet write with no shuffle and no sort, so spill
config *shouldn't* matter — this measures instead of guessing.

Runs p01 N times under each spill setting in separate SparkSessions
(config is immutable per JVM-session, so each arm restarts the
session) and prints medians + raw runs.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("BISECT_RUNS", "7"))


def run_arm(spill_compress: str) -> list[float]:
    from pyspark.sql import SparkSession

    from ai_etl_framework_spark.operators import NullRemover, QualityScorer
    from ai_etl_framework_spark.session import get_spark, load_table

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(
        app_name=f"bisect_p01_{spill_compress}",
        extra_conf={"spark.shuffle.spill.compress": spill_compress},
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.shuffle.spill.compress") == spill_compress
    orders = load_table(spark, SF_DIR, "orders")
    orders.count()  # warm the file listing/footer path like bench.py
    runs: list[float] = []
    for _ in range(N):
        out_dir = tempfile.mkdtemp(prefix="bisect_p01_")
        try:
            t0 = time.perf_counter()
            cleaned = NullRemover(strategy="drop")(orders)
            scored = QualityScorer()(cleaned)
            scored.write.mode("overwrite").parquet(out_dir)
            runs.append(round(time.perf_counter() - t0, 4))
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return runs


def main() -> None:
    result = {}
    for arm in ("true", "false"):
        runs = run_arm(arm)
        result[f"spill_compress_{arm}"] = {
            "runs": runs,
            "median": round(statistics.median(runs), 4),
            "min": min(runs),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
