"""Experiment: what do manifest pruning and Z-order actually save?

Builds a pool from the gsf1 events table (1M rows, 20 commits of 50k),
then measures — wall-clock, noop-sink, min-of-3 — three ways of
answering the same two predicates:

  full   : scan() + row filter (what Catalyst alone can do)
  bounds : scan(bounds=) + row filter, lexicographic cluster_by layout
  zorder : scan(bounds=) + row filter, Morton layout (same columns)

Predicates: a leading-column range (value.etype equality) and a
SECOND-column range (value.v window) — the one lexicographic layouts
cannot skip on. Also prints files kept per layout. Results feed
SCALING.md §10.

Usage: python tools/exp_skipping.py [gsf_dir]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.queries import T, _scratch_dir
from zync_spark.session import get_spark


def _materialize(df):
    df.write.mode("overwrite").format("noop").save()


def _tmin(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(sf_dir="/root/repo/.localdata/gsf1"):
    spark = get_spark("exp-skip", shuffle_partitions=8, adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    ev = T(spark, sf_dir, "events")
    env = ev.select(
        F.struct(F.lit("events").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("event_id").cast("long").alias("offset")).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct(F.col("event_type").alias("etype"),
                 F.col("value").alias("v"),
                 F.col("user_id").alias("uid")).alias("value"),
    )
    lake = _scratch_dir("zs-exp-skip")
    shutil.rmtree(lake, ignore_errors=True)
    pools = {}
    n = env.count()
    span = 50_000
    for name in ("lex", "zo"):
        p = Pool.create(spark, f"{lake}/{name}")
        for lo in range(0, n, span):
            batch = env.filter((F.col("kafka.offset") >= lo)
                               & (F.col("kafka.offset") < lo + span))
            p.load(batch, f"c{lo}")
        p.compact(target_rows=span // 2, cluster_by=["value.etype", "value.v"],
                  zorder=(name == "zo"))
        pools[name] = p
    cols = ["kafka.offset", "value.etype", "value.v"]

    preds = {
        "lead: etype == 'click'": (
            {"value.etype": ("click", "click")},
            F.col("value.etype") == "click"),
        "second: 100 <= v <= 120": (
            {"value.v": (100.0, 120.0)},
            F.col("value.v").between(100.0, 120.0)),
    }
    print(f"{'predicate':28s} {'layout':6s} {'files':>9s} {'sec':>7s}")
    for pname, (bounds, rowf) in preds.items():
        for lname, p in pools.items():
            total = len(p.committed_files())
            kept = len(p.committed_files(bounds=bounds))
            full = _tmin(lambda: _materialize(
                p.scan().filter(rowf).select(*cols)))
            pruned = _tmin(lambda: _materialize(
                p.scan(bounds=bounds).filter(rowf).select(*cols)))
            print(f"{pname:28s} {lname:6s} {kept:>4d}/{total:<4d} "
                  f"full {full:5.2f}s pruned {pruned:5.2f}s")
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
