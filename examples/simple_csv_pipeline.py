"""Mirror of the reference's examples/simple_csv_pipeline.py:
CSV in → clean nulls → drop an unwanted column → parquet out.

Run: python examples/simple_csv_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_etl_framework_spark.operators import ColumnRemover, NullRemover
from ai_etl_framework_spark.pipeline.pipeline import Pipeline
from ai_etl_framework_spark.session import get_spark
from ai_etl_framework_spark.sinks.writers import write_parquet
from ai_etl_framework_spark.sources.readers import read_csv


def main() -> None:
    spark = get_spark(app_name="example-simple-csv")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="example_")

    # make a small messy CSV (stands in for the reference's sample data)
    src_csv = os.path.join(workdir, "in.csv")
    with open(src_csv, "w") as f:
        f.write("id,name,email,notes\n")
        f.write("1,Alice,alice@example.com,fine\n")
        f.write("2,,bob@example.com,\n")          # empty name -> dropped ("" == NULL)
        f.write("3,Carol,carol@example.com,ok\n")

    out = os.path.join(workdir, "out.parquet")
    result = (
        Pipeline("simple-csv")
        .extract(read_csv(spark, src_csv))
        .transform(NullRemover(strategy="drop"))       # any null/"" -> drop row
        .transform(ColumnRemover(columns=["notes"]))
        .load(lambda df: write_parquet(df, out))
        .run()
    )
    print(f"loaded {result.records_loaded} records -> {out}")
    final = spark.read.parquet(out)
    assert final.count() == 2 and "notes" not in final.columns
    final.show()


if __name__ == "__main__":
    main()
