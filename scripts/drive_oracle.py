#!/usr/bin/env python
"""Drive the driver contract exactly like the correctness gate: run
queries() on Spark and oracle_sql() on DuckDB over the same parquet,
canonical-hash both, report MATCH/MISMATCH per query.

Usage:
    python scripts/drive_oracle.py                 # all oracle queries
    python scripts/drive_oracle.py q12 dd03        # prefix match
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/drive_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, bool):
                v = int(v)
            if isinstance(v, float):
                # normalize -0.0/underflow like tests/test_oracle_parity
                v = "0" if v == 0 else f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest(), len(out)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from ai_etl_framework_spark.session import get_spark

    prefixes = sys.argv[1:]
    qs, oq = entry.queries(), entry.oracle_sql()
    names = [n for n in oq if not prefixes or any(n.startswith(p) for p in prefixes)]

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION"):
        # replicate the verification driver's environment: a PLAIN
        # SparkSession with Spark 4 defaults (ANSI mode on, 200 shuffle
        # partitions, none of get_spark's permissive-cast or tuning
        # confs) — catches any query that silently depends on our
        # session configuration instead of setting what it needs at
        # runtime (load_table's nanosAsLong/UTC pattern)
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.appName("drive-oracle-plain")
            .master(f"local[{cpus}]")
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="drive-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oq[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            sh, sn = canon(srows, scols)
            oh, on = canon(orows, ocols)
            ok = sh == oh and sorted(scols) == sorted(ocols)
            print(f"{name}: spark={sn} oracle={on} {'MATCH' if ok else 'MISMATCH'}")
            if not ok:
                failures += 1
                if sorted(scols) != sorted(ocols):
                    print(f"  cols: {sorted(scols)} vs {sorted(ocols)}")
                else:
                    a = sorted("|".join(map(str, r)) for r in srows)[:3]
                    b = sorted("|".join(map(str, r)) for r in orows)[:3]
                    print(f"  spark: {a}\n  duck : {b}")
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
