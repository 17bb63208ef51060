"""Experiment: q1 decimal-agg vs long-cents vs raw-double. Times only."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zync_spark.queries import T, q1_pricing_summary
from zync_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q1_cents(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    # exact integer cents: inputs are 2-decimal; round() snaps the 1-ulp
    # double error, never a true halfway case.
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    ep = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    tax = F.round(F.col("l_tax") * 100).cast("long")
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("decimal(38,0)") / 100).cast("double").alias("sum_qty"),
            (F.sum(ep).cast("decimal(38,0)") / 100).cast("double").alias("sum_base_price"),
            (F.sum(ep * (100 - disc)).cast("decimal(38,0)") / 10000).cast("double").alias("sum_disc_price"),
            (F.sum(ep * (100 - disc) * (100 + tax)).cast("decimal(38,0)") / 1000000).cast("double").alias("sum_charge"),
            ((F.sum(qty).cast("decimal(38,0)") / 100).cast("double") / cnt).alias("avg_qty"),
            ((F.sum(ep).cast("decimal(38,0)") / 100).cast("double") / cnt).alias("avg_price"),
            ((F.sum(disc).cast("decimal(38,0)") / 100).cast("double") / cnt).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q1_hybrid(spark, sf_dir):
    """Long-integer multiply (codegen fast path), decimal sum (no overflow)."""
    li = T(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    ep = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    tax = F.round(F.col("l_tax") * 100).cast("long")
    dp = (ep * (100 - disc)).cast("decimal(20,0)")
    ch = (ep * (100 - disc) * (100 + tax)).cast("decimal(20,0)")
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("decimal(38,0)") / 100).cast("double").alias("sum_qty"),
            (F.sum(ep.cast("decimal(20,0)")) / 100).cast("double").alias("sum_base_price"),
            (F.sum(dp) / 10000).cast("double").alias("sum_disc_price"),
            (F.sum(ch) / 1000000).cast("double").alias("sum_charge"),
            ((F.sum(qty).cast("decimal(38,0)") / 100).cast("double") / cnt).alias("avg_qty"),
            ((F.sum(ep.cast("decimal(20,0)")) / 100).cast("double") / cnt).alias("avg_price"),
            ((F.sum(disc).cast("decimal(38,0)") / 100).cast("double") / cnt).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q1_double(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    ep, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(ep).alias("sum_base_price"),
            F.sum(ep * (1 - disc)).alias("sum_disc_price"),
            F.sum(ep * (1 - disc) * (1 + tax)).alias("sum_charge"),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (F.sum(ep) / cnt).alias("avg_price"),
            (F.sum(disc) / cnt).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def main():
    spark = get_spark("exp-q1")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "decimal": q1_pricing_summary,
        "cents": q1_cents,
        "hybrid": q1_hybrid,
        "double": q1_double,
    }
    for name, fn in variants.items():
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF).collect()
            times.append(round(time.perf_counter() - t0, 3))
        print(name, times, flush=True)
    # value parity check decimal vs cents
    a = sorted(map(tuple, q1_pricing_summary(spark, SF).collect()))
    b = sorted(map(tuple, q1_cents(spark, SF).collect()))
    c = sorted(map(tuple, q1_hybrid(spark, SF).collect()))
    print("cents == decimal:", a == b, "hybrid == decimal:", a == c)


if __name__ == "__main__":
    main()
