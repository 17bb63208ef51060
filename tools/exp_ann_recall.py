"""Recall-vs-nprobe curve of the incremental IVF ANN index (round-5 ask:
retrieval QUALITY measured, not just determinism).

Builds the same backfill-trained index as the `ann_index_incremental` /
`ann_recall_at10` catalog entries at each scale factor, then sweeps
nprobe and reports avg/min recall@10 of `ann_query` against exact
brute-force cosine top-k over the stored corpus, plus the probed
coverage fraction (the random-probing baseline recall would collapse
to). Results land in SCALING.md §8.

Usage: python tools/exp_ann_recall.py [sf_dir ...]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zync_spark.pool import Pool  # noqa: E402
from zync_spark.queries import T, _scratch_dir  # noqa: E402
from zync_spark.session import get_spark  # noqa: E402
from zync_spark.streaming import ann_index as AI  # noqa: E402

N_CELLS = 16
K = 10
N_QUERIES = 25


def run(spark, sf_dir: str) -> None:
    emb = T(spark, sf_dir, "embeddings")
    total = emb.count()
    cut = (emb.agg(F.max("vec_id")).collect()[0][0] * 3) // 5
    env = emb.select(
        F.struct(
            F.lit("emb").alias("topic"),
            F.lit(0).cast("long").alias("partition"),
            F.col("vec_id").cast("long").alias("offset"),
        ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("vec_id", "embedding").alias("value"),
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    lake = _scratch_dir(f"zs-exp-annrecall-{tag}")
    shutil.rmtree(lake, ignore_errors=True)
    src = Pool.create(spark, f"{lake}/src")
    dest = Pool.create(spark, f"{lake}/index")
    spec = AI.AnnIndexSpec("emb", "value.vec_id", "value.embedding",
                           n_cells=N_CELLS, iterations=2)
    src.load(env.filter(F.col("kafka.offset") < cut), "backfill")
    AI.sync_ann(src, dest, spec, ["emb"])
    src.load(env.filter(F.col("kafka.offset") >= cut), "delta")
    AI.sync_ann(src, dest, spec, ["emb"])
    AI.compact_ann(dest, target_rows=max(200, total // 8))
    cells = {
        r["cell"]: r["n"]
        for r in dest.scan().filter(F.col("zed_type") == "vec")
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    cents = AI.stored_centroids(dest, spec)
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    print(f"{tag}: corpus={total} cells={len(cents)}")
    from zync_spark.functions import similarity as S

    exact = AI.ann_exact_topk(dest, spec, qs, k=K).persist()
    nprobe = 1
    while nprobe <= N_CELLS:
        r = AI.ann_recall(dest, spec, qs, k=K, nprobe=nprobe, exact=exact)
        row = r.agg(F.avg("recall").alias("a"),
                    F.min("recall").alias("m")).collect()[0]
        qa = S.ivf_assign(
            qs.select(F.col("vec_id").alias("qid"),
                      F.col("embedding").alias("qv")),
            cents, "qv", nprobe=nprobe)
        probed: dict[int, set] = {}
        for q in qa.select("qid", "__cell").collect():
            probed.setdefault(q["qid"], set()).add(q["__cell"])
        cov = sum(
            sum(cells.get(c, 0) for c in cs) / total
            for cs in probed.values()
        ) / len(probed)
        lift = row["a"] / cov if cov else float("nan")
        print(f"  nprobe={nprobe:2d}  avg_recall@10={row['a']:.3f}  "
              f"min={row['m']:.3f}  coverage={cov:.3f}  lift={lift:.2f}")
        nprobe *= 2
    exact.unpersist()
    shutil.rmtree(lake, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                            "/root/testdata/sf0.1"]
    spark = get_spark("zs-exp-annrecall")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        run(spark, d)


if __name__ == "__main__":
    main()
