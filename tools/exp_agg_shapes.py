"""Round-12 A/B: alternative physical shapes for the aggregate-family
catalog entries that the round-12 sweep still showed at 0.6-1.0 s warm
(q_approx_distinct, q_agg_stats, q_rollup_agg, q18_large_volume).

Each variant computes the IDENTICAL result (argued per variant below and
verified by a collected-row comparison at the end of each block); this
harness exists to pick the fastest shape with interleaved warm timings
before committing one (guide §1: measure first).

Usage: python tools/exp_agg_shapes.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zync_spark.functions.compute import ensure_compute_splits as _spread
from zync_spark.queries import QUERIES, T
from zync_spark.session import get_spark


def timeit(df, label, reps):
    runs = []
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    print(f"  {label:34s} cold={runs[0]:.3f} warm_min={min(runs[1:]):.3f} "
          f"warm={['%.3f' % r for r in runs[1:]]}", flush=True)
    return min(runs[1:])


def rows_equal(a, b, sort_cols):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    return ra == rb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    corpus_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    shuffle_parts = 8 if corpus_bytes < 32 << 20 else (
        16 if corpus_bytes < 96 << 20 else 32)
    spark = get_spark("agg-shapes", shuffle_partitions=shuffle_parts,
                      adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- q_approx_distinct -------------------------------------------
    # Current: ONE agg mixing exact distinct + HLL -> the planner's
    # rewrite keys the partial agg by (event_type, user_id), so an HLL
    # sketch buffer is built and merged PER DISTINCT PAIR (~1M buffers).
    # Variant: split the two aggregates (HLL keyed by type only: a
    # handful of sketches; exact distinct unchanged) and join the two
    # tiny results. approx_count_distinct is register-max, so inserting
    # a user once or many times and merging in any grouping yields
    # byte-identical registers -> identical estimate.
    print("== q_approx_distinct", flush=True)
    cur = QUERIES["q_approx_distinct"](spark, sf_dir)

    def split_agg(spread):
        ev = T(spark, sf_dir, "events").select("event_type", "user_id")
        if spread:
            ev = _spread(ev)
        exact = ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("exact_users"))
        ap = ev.groupBy("event_type").agg(
            F.approx_count_distinct("user_id", 0.02).alias("_approx"))
        return exact.join(ap, "event_type").select(
            "event_type", "exact_users",
            (F.abs(F.col("_approx") - F.col("exact_users"))
             <= 0.05 * F.col("exact_users")).alias("within_5pct"))

    v1, v2 = split_agg(False), split_agg(True)
    timeit(cur, "current (mixed agg)", reps)
    timeit(v1, "split aggs", reps)
    timeit(v2, "split aggs + spread", reps)
    assert rows_equal(cur, v1, None) and rows_equal(cur, v2, None)
    print("  rows identical", flush=True)

    # ---- q_agg_stats --------------------------------------------------
    # Current: one agg with count_distinct -> two-level rewrite keyed by
    # l_orderkey carrying ALL the decimal/min/max buffers per key.
    # Variant: split the distinct count from the scalar aggregates so the
    # orderkey-keyed exchange carries nothing but the key.
    print("== q_agg_stats", flush=True)
    cur = QUERIES["q_agg_stats"](spark, sf_dir)

    def split_stats(spread):
        li = T(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice")
        if spread:
            li = _spread(li)
        plain = li.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
             / F.count("*")).alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        nd = li.agg(F.count_distinct(F.col("l_orderkey")).alias("n_orders"))
        return plain.crossJoin(F.broadcast(nd)).select(
            "n_rows", "n_orders", "total_qty", "avg_price",
            "min_price", "max_price")

    v1, v2 = split_stats(False), split_stats(True)
    timeit(cur, "current (mixed agg, spread)", reps)
    timeit(v1, "split distinct", reps)
    timeit(v2, "split distinct + spread", reps)
    assert rows_equal(cur, v1, None) and rows_equal(cur, v2, None)
    print("  rows identical", flush=True)

    # ---- q_rollup_agg --------------------------------------------------
    # Current: rollup -> Expand x3 of 600k rows on the single scan split.
    # Variant: aggregate once at the finest level (map-side combine to ~6
    # rows), then re-aggregate the TINY result for the two coarser levels
    # and union. Counts/decimal sums are exactly associative; rollup's
    # null-markers are reproduced literally. (TPC-H returnflag/linestatus
    # are non-null, and both engines conflate data-nulls with total rows
    # identically anyway.)
    print("== q_rollup_agg", flush=True)
    cur = QUERIES["q_rollup_agg"](spark, sf_dir)

    def union_reagg(spread):
        li = T(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_quantity")
        if spread:
            li = _spread(li)
        base = li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count("*").alias("__n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__q"))
        from pyspark import StorageLevel
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        lvl0 = base.select(
            "l_returnflag", "l_linestatus",
            F.col("__n").alias("n"), F.col("__q").cast("double").alias("qty"))
        lvl1 = base.groupBy("l_returnflag").agg(
            F.sum("__n").alias("n"), F.sum("__q").cast("double").alias("qty")
        ).select("l_returnflag",
                 F.lit(None).cast("string").alias("l_linestatus"), "n", "qty")
        lvl2 = base.agg(
            F.sum("__n").alias("n"), F.sum("__q").cast("double").alias("qty")
        ).select(F.lit(None).cast("string").alias("l_returnflag"),
                 F.lit(None).cast("string").alias("l_linestatus"), "n", "qty")
        return lvl0.unionByName(lvl1).unionByName(lvl2)

    v1, v2 = union_reagg(False), union_reagg(True)
    timeit(cur, "current (rollup Expand)", reps)
    timeit(v1, "union re-agg", reps)
    timeit(v2, "union re-agg + spread", reps)
    assert rows_equal(cur, v1, None) and rows_equal(cur, v2, None)
    print("  rows identical", flush=True)

    # ---- q18_large_volume ----------------------------------------------
    # Plan is already all-broadcast; both lineitem passes run their
    # partial aggregation on the scan's single split. Variant: _spread
    # the `big` aggregation input and the probe side.
    print("== q18_large_volume", flush=True)
    cur = QUERIES["q18_large_volume"](spark, sf_dir)

    def q18_spread():
        l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = T(spark, sf_dir, "orders")
        c = T(spark, sf_dir, "customer")
        ls = _spread(l)
        big = (ls.groupBy("l_orderkey")
               .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__q"))
               .filter(F.col("__q") > 250).select("l_orderkey"))
        return (
            ls.join(F.broadcast(big), "l_orderkey")
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                 .cast("double").alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(100))

    v1 = q18_spread()
    timeit(cur, "current", reps)
    timeit(v1, "spread both passes", reps)
    ra = [tuple(r) for r in cur.collect()]
    rb = [tuple(r) for r in v1.collect()]
    assert ra == rb, "q18 ordered rows differ"
    print("  rows identical", flush=True)


if __name__ == "__main__":
    main()
