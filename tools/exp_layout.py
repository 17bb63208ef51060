"""Data-layout experiment: does q5's local floor come from the testdata's
single-row-group files (one task per scan)?

Rewrites lineitem/orders at sf0.1 into multi-row-group parquet (the layout
any real ingest produces at scale), then times the q5 join pipeline on both
layouts with identical session config. Read-only on /root/testdata; copies
go to /tmp. Findings land in SCALING.md §5.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
OUT = "/tmp/layout_sf0.1"


def build_copies(spark):
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    for name, parts in [("lineitem", 16), ("orders", 8)]:
        (
            spark.read.parquet(f"{SF}/{name}.parquet")
            .repartition(parts)
            .write.option("parquet.block.size", 8 * 1024 * 1024)
            .parquet(f"{OUT}/{name}.parquet")
        )


def q5(spark, li_path, o_path):
    li = spark.read.parquet(li_path)
    o = spark.read.parquet(o_path)
    c = spark.read.parquet(f"{SF}/customer.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    r = spark.read.parquet(f"{SF}/region.parquet").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")).alias("rev"))
    )


def best_of(fn, n=5):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return min(runs), runs


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_copies(spark)
    stock, rs = best_of(lambda: q5(spark, f"{SF}/lineitem.parquet", f"{SF}/orders.parquet"))
    print("stock single-row-group:", round(stock, 3), [round(x, 2) for x in rs])
    multi, rm = best_of(lambda: q5(spark, f"{OUT}/lineitem.parquet", f"{OUT}/orders.parquet"))
    print("multi-row-group:", round(multi, 3), [round(x, 2) for x in rm])
    print(f"speedup: {stock / multi:.2f}x")
