"""Data-skipping experiment: quantify scan(bounds=) file pruning on a
cluster_by-compacted pool.

Builds a pool from the sf0.1 events table (enveloped, one commit), then
compacts it clustered by value.user_id into many small files, and times a
selective per-user aggregate two ways with identical session config:

  full  — scan() + row filter (what the reference's full-scan model does)
  skip  — scan(bounds=) + the same row filter (manifest file pruning)

Also reports the file counts, which at 100 TB are the real story: the
pruned scan opens a constant number of files as the pool grows, the full
scan opens all of them. Prints one JSON line. Findings land in SCALING.md.

Usage: python tools/exp_skip.py [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/skip_pool"


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("exp-skip", shuffle_partitions=8, adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    env = ev.select(
        F.struct(
            F.lit("events").alias("topic"),
            F.lit(0).cast("long").alias("partition"),
            F.col("event_id").cast("long").alias("offset"),
        ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("user_id", "event_type", "value").alias("value"),
    )
    pool = Pool.create(spark, OUT)
    pool.load(env, "events sf0.1")
    rows = pool.scan().count()
    pool.compact(target_rows=max(1, rows // n_files),
                 cluster_by=["value.user_id"])

    uid_min, uid_max = (
        env.agg(F.min("value.user_id"), F.max("value.user_id")).collect()[0]
    )
    span = max(1, (uid_max - uid_min) // 50)  # ~2% of the id space
    lo, hi = uid_min + 3 * span, uid_min + 4 * span
    rowf = F.col("value.user_id").between(lo, hi)

    def agg(df):
        return (
            df.filter(rowf)
            .groupBy("value.user_id")
            .agg(F.count("*").alias("n"), F.sum("value.value").alias("tot"))
        )

    def run(df):
        t0 = time.perf_counter()
        agg(df).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    full_files = len(pool.committed_files())
    skip_files = len(pool.committed_files(bounds={"value.user_id": (lo, hi)}))
    # warm both paths once (codegen), then min-of-3
    full = min(run(pool.scan()) for _ in range(3))
    skip = min(
        run(pool.scan(bounds={"value.user_id": (lo, hi)})) for _ in range(3)
    )
    print(
        json.dumps(
            {
                "metric": "skip_speedup",
                "value": round(full / skip, 2),
                "unit": "x",
                "rows": rows,
                "files_total": full_files,
                "files_scanned": skip_files,
                "full_sec": round(full, 3),
                "skip_sec": round(skip, 3),
                "uid_range": [int(lo), int(hi)],
            }
        )
    )


if __name__ == "__main__":
    main()
