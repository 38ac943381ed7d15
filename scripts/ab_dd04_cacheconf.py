#!/usr/bin/env python
"""Interleaved A/B of dd04_ngram_jaccard under in-memory-columnar cache
configs (guide §1: measure; §5: caching costs). The dd04 pipeline
persists two frames per run (ngram_shingles, ppjoin_prefix) via
_cache_keep_one, so cache BUILD cost — columnar encoding + optional
compression of array<string> columns — is paid inside every timed run.

Interleaves arms round-robin in ONE process (conf is a runtime SQL
conf; each run builds a fresh plan, so persist() re-encodes under the
arm's conf) to cancel box drift. Delivery is toPandas(), matching the
bench protocol.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))

ARMS: dict[str, dict[str, str]] = {
    "default": {},
    "nocompress": {"spark.sql.inMemoryColumnarStorage.compressed": "false"},
    "bigbatch": {"spark.sql.inMemoryColumnarStorage.batchSize": "100000"},
    "nocomp+big": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "100000",
    },
}
BASE = {
    "spark.sql.inMemoryColumnarStorage.compressed": "true",
    "spark.sql.inMemoryColumnarStorage.batchSize": "10000",
}


def main() -> None:
    import __spark_entry__ as entrymod
    from ai_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="ab_dd04_cacheconf")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once() -> float:
        t0 = time.perf_counter()
        entrymod.dd04_ngram_jaccard(spark, SF_DIR).toPandas()
        return time.perf_counter() - t0

    # JVM/codegen warmup under default conf
    run_once()
    run_once()

    # ROTATE the arm order per rep: a fixed within-rep order hands
    # later arms the benefit of monotone box-drift decay — the first
    # run of this script (fixed order) read a spurious 10% "win" for
    # the last arm that vanished under rotation (r13 methodology
    # note in OPTIMIZATION_r13.md).
    runs: dict[str, list[float]] = {a: [] for a in ARMS}
    arm_names = list(ARMS)
    for rep in range(REPS):
        seq = arm_names[rep % len(arm_names):] + arm_names[:rep % len(arm_names)]
        for arm in seq:
            conf = ARMS[arm]
            for k, v in BASE.items():
                spark.conf.set(k, v)
            for k, v in conf.items():
                spark.conf.set(k, v)
            spark.sparkContext.setJobDescription(f"dd04[{arm}] rep{rep}")
            runs[arm].append(run_once())
    spark.sparkContext.setJobDescription(None)
    for arm, rs in runs.items():
        rs_s = sorted(rs)
        med = rs_s[len(rs_s) // 2]
        print(
            f"{arm:12s} median {med:6.3f}s  min {rs_s[0]:6.3f}  "
            f"mean {statistics.mean(rs):6.3f} ± {statistics.stdev(rs):5.3f}  "
            f"runs {[round(x, 3) for x in rs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
