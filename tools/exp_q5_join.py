"""Experiment: q5 join strategy at gsf1 under the bench session config.

The gsf1 laggard story (SCALING.md SS10) blames the per-attempt broadcast
hash build of the 1.5M-row orders/customer build sides.  Candidate
engine-honest alternatives, measured min-of-3 with the bench noop sink
(fresh plan per attempt, true re-execution):

  a_current     - size-based broadcast (64MB threshold, AQE off)
  b_aqe         - engine-default AQE on (runtime re-plan)
  c_shj         - preferSortMergeJoin=false at 64MB (SHJ when over
                  threshold; parallel per-partition hash build)
  e_shj_no_bcast / f_smj_no_bcast - broadcast threshold 1MB (only
                  nation x region fits), SHJ vs SMJ
  g_shj_32part  - SHJ at 32 shuffle partitions
  h_smj_10mb / i_shj_10mb - Spark's default 10MB threshold (customer
                  still broadcasts at gsf1, orders does not) x join
                  preference; i_ is what session.py now ships

Usage: python tools/exp_q5_join.py [sf_dir] [q]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from zync_spark.session import get_spark  # noqa: E402
from zync_spark import queries as Q  # noqa: E402


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def bench(spark, fn, sf_dir, n=3):
    best = None
    for _ in range(n):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        materialize(df)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/gsf1"
    qname = sys.argv[2] if len(sys.argv) > 2 else "q5_regional_revenue"
    fn = Q.QUERIES[qname]
    spark = get_spark("exp-q5", shuffle_partitions=8, adaptive=False)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")

    def reset():
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    results = {}
    # JVM/codegen warmup so the first measured variant isn't penalized
    # (C2 compilation + codegen class cache fill ~0.1-0.2s on first runs).
    reset()
    for _ in range(3):
        materialize(fn(spark, sf_dir))

    reset()
    results["a_current"] = bench(spark, fn, sf_dir)

    reset()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    results["b_aqe"] = bench(spark, fn, sf_dir)

    reset()
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    results["c_shj"] = bench(spark, fn, sf_dir)

    reset()
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))
    results["e_shj_no_bcast"] = bench(spark, fn, sf_dir)

    reset()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))
    results["f_smj_no_bcast"] = bench(spark, fn, sf_dir)

    reset()
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    results["g_shj_32part"] = bench(spark, fn, sf_dir)

    # The real candidates: Spark's default 10MB threshold (customer still
    # broadcasts at gsf1, orders does not) x join-family preference.
    reset()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(10 * 1024 * 1024))
    results["h_smj_10mb"] = bench(spark, fn, sf_dir)

    reset()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(10 * 1024 * 1024))
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    results["i_shj_10mb"] = bench(spark, fn, sf_dir)

    for k, v in results.items():
        print(f"{k:18s} {v:7.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
