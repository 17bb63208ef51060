"""Experiment: does the incremental embdedup (SemDeDup) index's
per-pass read stay bounded as the stored index grows? (Round 8 — the
fifth family's analog of exp_dedup_index_scale / exp_ann_recall.)

Builds the index over synthetic embeddings in one backfill (trains the
frozen blocks, compacted into many cell-clustered files) plus a stream
of SMALL deltas, recording each pass's file-skipping telemetry
(probe_files vs live_files from sync_embdedup's stats_out) and wall
time. Expected: live_files grows with the corpus; probe_files tracks
the DELTA's cell fan-out (<= the delta's distinct cells' files), not
the corpus; per-pass time tracks delta x its cells' stored vectors.
Results go to SCALING.md §16.

Usage: python tools/exp_embdedup_scale.py [n_backfill] [deltas] [per]
"""
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

from zync_spark.pool import Pool
from zync_spark.queries import _scratch_dir
from zync_spark.session import get_spark
from zync_spark.streaming import embdedup_index as ED

spark = get_spark("exp-embdedup", shuffle_partitions=16, adaptive=False)
spark.sparkContext.setLogLevel("ERROR")

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<vec_id:long,emb:array<double>>")
DIM = 64
# threshold sits ABOVE the latent-region similarity (~0.9 within a
# region for this synthetic) so the pair set is the planted near-dups,
# not a quadratic within-region blow-up — pair volume would otherwise
# dominate per-pass time and hide the probe cost being measured
SPEC = ED.EmbDedupIndexSpec("x", "value.vec_id", "value.emb",
                            n_cells=64, iterations=2, threshold=0.999)


def _vec(i):
    # clustered synthetic embeddings (8 latent regions) with a planted
    # near-dup every 40th vector; the noise term is a per-(i,j) hash so
    # distinct vectors are genuinely distinct (a modular pattern here
    # collapsed the corpus to 152 distinct vectors and made everything
    # a near-dup)
    if i % 40 == 39:
        return [x + 1e-4 for x in _vec(i - 1)]
    r = i % 8
    return [math.sin(0.31 * r + 0.7 * j)
            + 0.8 * (((i * 2654435761 + j * 40503) & 0xFFFF) / 65536.0
                     - 0.5)
            for j in range(DIM)]


def _load(src, lo, hi):
    rows = [(("emb", 0, i), "data", (i, _vec(i))) for i in range(lo, hi)]
    src.load(spark.createDataFrame(rows, ROW), f"[{lo},{hi})")


def main(backfill=20000, deltas=8, per=200):
    lake = _scratch_dir("zs-exp-embdedup")
    shutil.rmtree(lake, ignore_errors=True)
    src = Pool.create(spark, f"{lake}/src")
    dest = Pool.create(spark, f"{lake}/idx")
    t0 = time.perf_counter()
    _load(src, 0, backfill)
    ED.sync_embdedup(src, dest, SPEC, ["emb"])
    ED.compact_embdedup(dest, target_rows=max(backfill // 64, 200))
    print(json.dumps({"phase": "backfill", "docs": backfill,
                      "sec": round(time.perf_counter() - t0, 1),
                      "live_files": len(dest.committed_files())}))
    lo = backfill
    for d in range(deltas):
        stats: dict = {}
        t0 = time.perf_counter()
        _load(src, lo, lo + per)
        n = ED.sync_embdedup(src, dest, SPEC, ["emb"], stats_out=stats)
        print(json.dumps({
            "phase": "delta", "i": d, "rows": n,
            "sec": round(time.perf_counter() - t0, 2),
            "probe_files": stats.get("probe_files"),
            "live_files": stats.get("live_files"),
            "probe_frac": (round(stats["probe_files"]
                                 / stats["live_files"], 3)
                           if stats.get("live_files") else None),
        }), flush=True)
        lo += per
    pairs = ED.pairs_view(dest, SPEC)
    print(json.dumps({"phase": "done", "total_docs": lo,
                      "pairs": pairs.count() if pairs is not None else 0}))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
