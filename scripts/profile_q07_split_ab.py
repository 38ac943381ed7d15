import sys, time
sys.path.insert(0, "/root/repo")
from ai_etl_framework_spark.session import get_spark
from pyspark.sql import functions as F
from ai_etl_framework_spark.operators import Aggregator

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

SPEC = {
    "n_rows": {"field": "l_quantity", "function": "count"},
    "n_status": {"field": "l_linestatus", "function": "count_distinct"},
    "sum_qty_raw": {"field": "l_quantity", "function": "sum"},
    "avg_qty_raw": {"field": "l_quantity", "function": "avg"},
    "min_qty_raw": {"field": "l_quantity", "function": "min"},
    "max_qty_raw": {"field": "l_quantity", "function": "max"},
    "first_status": {"field": "l_linestatus", "function": "first"},
    "last_status": {"field": "l_linestatus", "function": "last"},
    "status_concat": {"field": "l_linestatus", "function": "concat"},
}
ORDER = ["l_orderkey","l_linenumber","l_suppkey","l_partkey","l_returnflag","l_linestatus"]

def current(df):
    return Aggregator(["l_returnflag"], SPEC, order_col=ORDER, distribute_sort="auto")(df)

def split(df):
    agg = Aggregator(["l_returnflag"], SPEC, order_col=ORDER, distribute_sort="auto")
    specs = list(SPEC.items())
    ordered = [(o,s) for o,s in specs if s["function"] in agg.ORDER_SENSITIVE]
    scalar  = [(o,s) for o,s in specs if s["function"] not in agg.ORDER_SENSITIVE]
    left = agg._aggregate(df, ordered)
    right = agg._aggregate(df, scalar)
    return agg._join_on_groups(left, right, specs)

# sanity: identical output
a = {tuple(r) for r in current(li).collect()}
b = {tuple(r) for r in split(li).collect()}
assert a == b, (sorted(a)[:1], sorted(b)[:1])
print("outputs identical:", len(a))

def t(fn):
    t0 = time.perf_counter(); fn(li).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter()-t0, 3)
t(current); t(split)
A, B = [], []
for i in range(7):
    A.append(t(current)); B.append(t(split))
print("current:", A, "med", sorted(A)[3])
print("split  :", B, "med", sorted(B)[3])
spark.stop()
