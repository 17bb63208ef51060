"""Round-11 optimization: isolate the embdedup REBUILD's phase costs
(VERDICT r10 ask #2 — the §19.11 resize remainder) without the full B2
delta protocol. Builds the same synthetic corpus as
exp_embdedup_scale (spark-side generator, md5 noise), sync-trains the
initial 64-cell quantizer on the backfill, then runs
rebuild_embdedup(n_cells=ceil(sqrt(N)), init="sample") with stats_out
and prints the phase stamps (sec_kmeans / sec_assign / sec_pairs /
sec_rewrite / total) plus the pair-set hash so a before/after code
change can prove the emitted set identical.

Usage: python tools/exp_rebuild_phases.py [n_docs] [iters_tag]
"""
import hashlib
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.queries import _scratch_dir
from zync_spark.session import get_spark
from zync_spark.streaming import embdedup_index as ED

import tools.exp_embdedup_scale as X  # reuse the corpus generator

spark = X.spark
X.GEN = "spark"


def main(n_docs: int = 110_000) -> None:
    root = _scratch_dir("zs-exp-rebuild")
    shutil.rmtree(root, ignore_errors=True)
    src = Pool.create(spark, f"{root}/src")
    dest = Pool.create(spark, f"{root}/idx")
    spec = ED.EmbDedupIndexSpec("x", "value.vec_id", "value.emb",
                                n_cells=64, iterations=2, threshold=0.999)
    t0 = time.time()
    X._load(src, 0, n_docs)
    so: dict = {}
    n = ED.sync_embdedup(src, dest, spec, ["emb"], stats_out=so)
    print(json.dumps({"phase": "backfill_sync", "rows": n,
                      "sec": round(time.time() - t0, 1), **so}))
    k = int(math.isqrt(n_docs))
    rso: dict = {}
    t1 = time.time()
    ED.rebuild_embdedup(dest, spec, n_cells=k, init="sample",
                        stats_out=rso)
    rso["wall"] = round(time.time() - t1, 1)
    print(json.dumps({"phase": "rebuild", "k": k, **rso}))
    pv = ED.pairs_view(dest, spec)
    rows = sorted(map(tuple, pv.select("id_a", "id_b", "cos").collect()))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    print(json.dumps({"phase": "pairs", "n_pairs": len(rows), "hash": h}))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 110_000)
