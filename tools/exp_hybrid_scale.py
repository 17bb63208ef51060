"""Hybrid-retrieval scale experiment: build the BM25 text index and the
IVF ANN index over the gsf1 corpus (50k documents, 50k vectors), then
measure per-leg probe boundedness (probe_files vs live_files) and
end-to-end latency of the fused query.

The claim under test (SCALING SS11): fusion cost is O(lists x k) and each
ranker leg reads only its bounded probe set, so hybrid retrieval latency
is governed by bucket/cell probes — not corpus size.

Usage: python tools/exp_hybrid_scale.py [sf_dir]
"""
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from zync_spark.functions.retrieval import rrf_fuse  # noqa: E402
from zync_spark.pool import Pool  # noqa: E402
from zync_spark.session import get_spark  # noqa: E402
from zync_spark.streaming import ann_index as AI  # noqa: E402
from zync_spark.streaming import text_index as TI  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/gsf1"
    spark = get_spark("exp-hybrid")
    spark.sparkContext.setLogLevel("ERROR")
    lake = "/tmp/zs-exp-hybrid"
    shutil.rmtree(lake, ignore_errors=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    t0 = time.perf_counter()
    tsrc = Pool.create(spark, f"{lake}/tsrc")
    tsrc.load(docs.select(
        F.struct(F.lit("docs").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("doc_id").cast("long").alias("offset")).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value")), "backfill")
    tdest = Pool.create(spark, f"{lake}/tidx")
    tspec = TI.TextIndexSpec("d", "value.doc_id", "value.text")
    TI.sync_text(tsrc, tdest, tspec, ["docs"])
    # small target_rows: force a many-file layout so probe_files vs
    # live_files actually demonstrates skipping (one 4M-row file would
    # trivially show 1/1)
    TI.compact_text(tdest, target_rows=max(2000, n_docs // 2))
    t_text_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    asrc = Pool.create(spark, f"{lake}/asrc")
    asrc.load(emb.select(
        F.struct(F.lit("emb").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("vec_id").cast("long").alias("offset")).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("vec_id", F.col("embedding").cast("array<double>")
                 .alias("emb")).alias("value")), "backfill")
    adest = Pool.create(spark, f"{lake}/aidx")
    # no min_train floor: the single backfill commit IS the full corpus,
    # so the first (and only) training delta is as good as it gets
    aspec = AI.AnnIndexSpec("e", "value.vec_id", "value.emb", n_cells=64,
                            iterations=2)
    AI.sync_ann(asrc, adest, aspec, ["emb"])
    AI.compact_ann(adest, target_rows=max(500, n_docs // 50))
    t_ann_build = time.perf_counter() - t0

    # query vector from the raw table (the caller's side of the API);
    # fetching it via an index scan would charge an unrelated lookup
    # cost to the query path
    qs = (emb.filter(F.col("vec_id") == 0)
          .select("vec_id",
                  F.col("embedding").cast("array<double>").alias("emb")))

    def timed(fn, n=3):
        best, out = None, None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    tstats, astats = {}, {}
    t_lex, lex_rows = timed(lambda: TI.search_text(
        tdest, tspec, ["vector", "merge", "hash"], k=20,
        stats_out=tstats).collect())
    t_sem, sem_rows = timed(lambda: AI.ann_query(
        adest, aspec, qs, id_col="vec_id", vec_col="emb", k=20, nprobe=4,
        stats_out=astats).collect())

    def fused():
        lex = TI.search_text(tdest, tspec, ["vector", "merge", "hash"],
                             k=20).select("doc_id", "rank")
        sem = AI.ann_query(adest, aspec, qs, id_col="vec_id",
                           vec_col="emb", k=20, nprobe=4).select(
            F.col("neighbor_id").alias("doc_id"), "rank")
        return rrf_fuse([lex, sem], names=["lex_rank", "sem_rank"],
                        k=10).collect()

    t_fused, fused_rows = timed(fused)

    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": n_docs,
        "build_sec": {"text": round(t_text_build, 2),
                      "ann": round(t_ann_build, 2)},
        "lex": {"sec": round(t_lex, 3), "rows": len(lex_rows), **tstats},
        "sem": {"sec": round(t_sem, 3), "rows": len(sem_rows), **astats},
        "fused": {"sec": round(t_fused, 3), "rows": len(fused_rows)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
