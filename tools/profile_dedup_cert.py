"""Profile dedup_index_incremental's mem-cert cost (round-9 ask #3).

SCALING §15 recorded 2063 s for this entry at gsf10 under the 2 GB /
local[8] / 256 m profile, vs 102-289 s for its ann/text/span siblings —
a 7-20x spread between entries of the same design. This tool runs the
SAME entry shape (documents table loaded into a source pool in three
commits, sync after each, rerun no-op, pairs_view) in the SAME
constrained JVM, but surfaces the per-pass phase decomposition the
round-9 stats_out instrumentation records:

    sec_delta         cursor collect (materializes the delta scan)
    sec_sigs          prefixes collect (materializes shingle sets +
                      64-hash MinHash signatures + band explode — the
                      persisted sigs frame)
    sec_probe         dbuckets collect (materializes the banded probe
                      of the stored index + the new x stored band join)
    sec_verify_commit exact-Jaccard verify of the candidate set + the
                      ckey-clustered atomic commit

plus candidate/pair counts per pass, so "where does the time go" has a
measured answer instead of a guess.

Usage: python tools/profile_dedup_cert.py SF_DIR
(gsf1 reproduces the shape in minutes; gsf10 is the certification
scale.) Env: MEM_CERT_DRIVER/MEM_CERT_CORES/MEM_CERT_RESULT as in
tools/mem_cert.py.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('MEM_CERT_CORES', '8')}]")
        .appName("zync-spark-profile-dedup")
        .config("spark.driver.memory",
                os.environ.get("MEM_CERT_DRIVER", "2g"))
        .config("spark.driver.maxResultSize",
                os.environ.get("MEM_CERT_RESULT", "256m"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from zync_spark.pool import Pool
    from zync_spark.queries import T, _scratch_dir
    from zync_spark.streaming import dedup_index as DI

    docs = T(spark, sf_dir, "documents")
    env = docs.select(
        F.struct(
            F.lit("documents").alias("topic"),
            F.lit(0).cast("long").alias("partition"),
            F.col("doc_id").cast("long").alias("offset"),
        ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value"),
    )
    lake = _scratch_dir("zs-profile-dedupidx")
    shutil.rmtree(lake, ignore_errors=True)
    src = Pool.create(spark, f"{lake}/src")
    dest = Pool.create(spark, f"{lake}/index")
    spec = DI.DedupIndexSpec(
        "documents", "value.doc_id", "value.text",
        k=3, num_hashes=64, bands=16, threshold=0.5)
    n = docs.count()
    cut1, cut2 = n // 3, 2 * n // 3
    total0 = time.perf_counter()
    for i, (lo, hi_) in enumerate(((None, cut1), (cut1, cut2),
                                   (cut2, None))):
        batch = env
        if lo is not None:
            batch = batch.filter(F.col("kafka.offset") >= lo)
        if hi_ is not None:
            batch = batch.filter(F.col("kafka.offset") < hi_)
        t0 = time.perf_counter()
        src.load(batch, f"documents [{lo},{hi_})")
        load_sec = round(time.perf_counter() - t0, 2)
        stats: dict = {}
        t0 = time.perf_counter()
        rows = DI.sync_index(src, dest, spec, ["documents"],
                             stats_out=stats)
        stats.update({"phase": "sync", "i": i, "rows": rows,
                      "src_load_sec": load_sec,
                      "sec": round(time.perf_counter() - t0, 2)})
        print(json.dumps(stats), flush=True)
    t0 = time.perf_counter()
    rerun = DI.sync_index(src, dest, spec, ["documents"])
    print(json.dumps({"phase": "rerun", "rows": rerun,
                      "sec": round(time.perf_counter() - t0, 2)}),
          flush=True)
    t0 = time.perf_counter()
    view = DI.pairs_view(dest, spec)
    n_pairs = view.count()
    print(json.dumps({"phase": "pairs_view", "pairs": n_pairs,
                      "sec": round(time.perf_counter() - t0, 2),
                      "total_sec": round(time.perf_counter() - total0, 1)}),
          flush=True)
    shutil.rmtree(lake, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  os.path.join(REPO, ".localdata/gsf1")))
