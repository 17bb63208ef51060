"""Experiment: does the incremental embdedup (SemDeDup) index's
per-pass read stay bounded as the stored index grows? (Round 8 — the
fifth family's analog of exp_dedup_index_scale / exp_ann_recall.
Round 9 adds the OCCUPANCY dimension: n_cells is frozen at creation,
so with a fixed cell count the per-pass constant grows linearly with
the corpus even while probe_files stays bounded — the experiment now
grows the corpus a full decade past the r8 pin, measures per-pass time
fattening, applies the health loop's sqrt(N) resize
(check_embdedup_health -> rebuild_embdedup(n_cells=...)), and shows
per-pass time dropping back after it.)

Builds the index over synthetic embeddings in one backfill (trains the
frozen blocks, compacted into many cell-clustered files) plus a stream
of deltas, recording each pass's file-skipping telemetry (probe_files
vs live_files from sync_embdedup's stats_out), wall time, and the mean
cell occupancy. Expected: live_files grows with the corpus;
probe_files tracks the DELTA's cell fan-out; per-pass time tracks
delta x mean occupancy — LINEAR in the corpus with frozen cells, flat
after the resize. Results go to SCALING.md §16.

Usage: python tools/exp_embdedup_scale.py [n_backfill] [deltas] [per]
           [post_resize_deltas] [max_mean_occupancy]
  - post_resize_deltas > 0 runs the health+resize phase after the main
    delta series, then that many more deltas against the resized index.
"""
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

spark = get_spark("exp-embdedup",
                  shuffle_partitions=int(os.environ.get(
                      "EXP_SHUFFLE", "16")),
                  adaptive=False)
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


# Noise generator. The r8 runs used an LCG-style per-(i,j) hash
# ((i*K + j*40503) & 0xFFFF), which is fine at the 4k/20k scales they
# pinned — but the construction is AFFINE in i: docs whose (i*K mod 2^w)
# values are close get near-CONSTANT-OFFSET noise vectors, i.e. genuine
# >=0.999 near-dups, at ANY mask width (measured: ~1% of random pairs
# at both 16 and 32 bits; ~500 true near-dups per doc by the 200k
# decade, 57M pairs by 230k docs — per-pass time then measures true-
# pair EMISSION, a property of the data, not the index). The round-9
# decade runs use md5 noise (structureless: 0 of 2,858 sampled random
# pairs >= 0.999) so the measurement isolates probe/occupancy cost;
# pass noise="lcg" to reproduce the r8 series.
NOISE = "md5"


def _noise(i, j):
    if NOISE == "lcg":
        return ((i * 2654435761 + j * 40503) & 0xFFFF) / 65536.0 - 0.5
    import hashlib

    h = int(hashlib.md5(f"n{i},{j}".encode()).hexdigest()[:8], 16)
    return h / 4294967296.0 - 0.5


def _vec(i):
    # clustered synthetic embeddings (8 latent regions) with a planted
    # near-dup every 40th vector; the noise term is a per-(i,j) hash so
    # distinct vectors are genuinely distinct (a modular pattern here
    # collapsed the corpus to 152 distinct vectors and made everything
    # a near-dup)
    if i % 40 == 39:
        return [x + 1e-4 for x in _vec(i - 1)]
    r = i % 8
    return [math.sin(0.31 * r + 0.7 * j) + 0.8 * _noise(i, j)
            for j in range(DIM)]


GEN = "py"  # "spark": distributed generation (decade-up runs, round 11)


def _vec_sql() -> str:
    """The SAME synthetic corpus as _vec()/_noise(), generated
    EXECUTOR-SIDE (round 11, VERDICT ask #1): a ~1M-doc decade-up run
    cannot build 64M python floats on the driver and serialize them
    through createDataFrame. md5 agrees byte-for-byte across engines
    (the repo's oracle-hashing rule), so the noise term is identical;
    sin() may differ from CPython's libm in the last ulp — irrelevant at
    the 0.999 threshold (cluster separation ~0.1, planted near-dup
    cosine ~1-1e-7), and verified < 1e-9 by the genparity phase."""
    b = "(CASE WHEN id % 40 = 39 THEN id - 1 ELSE id END)"
    return (
        f"transform(sequence(0, {DIM - 1}), j -> ("
        f"sin(0.31 * cast({b} % 8 AS double) + 0.7 * cast(j AS double))"
        f" + 0.8 * (cast(conv(substr(md5(concat('n', cast({b} AS string),"
        f" ',', cast(j AS string))), 1, 8), 16, 10) AS double)"
        f" / 4294967296.0 - 0.5)"
        f" + (CASE WHEN id % 40 = 39 THEN 1e-4 ELSE 0.0 END)))"
    )


def _load(src, lo, hi):
    if GEN == "spark":
        df = spark.range(lo, hi).select(
            F.struct(F.lit("emb").alias("topic"),
                     F.lit(0).cast("long").alias("partition"),
                     F.col("id").alias("offset")).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct(F.col("id").alias("vec_id"),
                     F.expr(_vec_sql()).alias("emb")).alias("value"))
        src.load(df, f"[{lo},{hi})")
        return
    rows = [(("emb", 0, i), "data", (i, _vec(i))) for i in range(lo, hi)]
    src.load(spark.createDataFrame(rows, ROW), f"[{lo},{hi})")


def _gen_parity_check(sample: int = 200) -> float:
    """Max |spark_gen - python_gen| over a sample covering every region
    and the planted-near-dup branch — the spark generator's honesty
    check (must be < 1e-9; md5 noise is exact, sin may differ 1 ulp)."""
    ids = list(range(80)) + [39 + 40 * k for k in range(1, 31)]
    ids = sorted(set(ids))[:sample]
    got = {r["id"]: r["v"] for r in
           spark.range(0, max(ids) + 1).filter(F.col("id").isin(ids))
           .select("id", F.expr(_vec_sql()).alias("v")).collect()}
    worst = 0.0
    for i in ids:
        py = _vec(i)
        sp = got[int(i)]
        worst = max(worst, max(abs(a - b) for a, b in zip(py, sp)))
    return worst


def _occupancy(dest):
    """Mean/max live vectors per used cell — the same bounded 'l:'
    groupBy check_embdedup_health runs (tombstone mask skipped: this
    experiment never deletes)."""
    from zync_spark.streaming.ann_index import _is_vec

    df = dest.scan(bounds={"ckey": ("l:", "l:g")})
    if df is None or "cell" not in df.columns:
        return None
    row = (df.filter(_is_vec(SPEC)).groupBy("cell")
           .agg(F.count("*").alias("n"))
           .agg(F.max("n").alias("mx"), F.avg("n").alias("av"),
                F.count("*").alias("nc")).collect()[0])
    return {"cells_used": int(row["nc"] or 0),
            "mean_occ": round(float(row["av"] or 0.0), 1),
            "max_occ": int(row["mx"] or 0)}


def main(backfill=20000, deltas=8, per=200, post_resize_deltas=0,
         max_mean_occupancy=1024.0, noise="md5", gen="py",
         n_cells=None):
    """gen="spark" + n_cells=<initial quantizer size> are the round-11
    decade-up knobs: distributed corpus generation and a spec sized for
    the backfill (sqrt(backfill)-class), so the protocol's shape —
    frozen quantizer outgrown by ~a decade, then one policy resize —
    is preserved at 1M docs."""
    global NOISE, GEN, SPEC
    NOISE = str(noise)
    GEN = str(gen)
    if n_cells is not None:
        SPEC = ED.EmbDedupIndexSpec(
            "x", "value.vec_id", "value.emb", n_cells=int(n_cells),
            iterations=SPEC.iterations, threshold=SPEC.threshold)
    if GEN == "spark":
        worst = _gen_parity_check()
        print(json.dumps({"phase": "genparity",
                          "max_abs_diff": worst}), flush=True)
        assert worst < 1e-9, "spark generator diverged from _vec()"
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
                      "live_files": len(dest.committed_files()),
                      "occupancy": _occupancy(dest)}))
    state = {"lo": backfill}

    def run_deltas(tag, count, occ_every):
        for d in range(count):
            lo = state["lo"]
            stats: dict = {}
            t0 = time.perf_counter()
            _load(src, lo, lo + per)
            n = ED.sync_embdedup(src, dest, SPEC, ["emb"], stats_out=stats)
            rec = {
                "phase": tag, "i": d, "rows": n, "docs": lo + per,
                "sec": round(time.perf_counter() - t0, 2),
                "sec_delta": stats.get("sec_delta"),
                "sec_assign": stats.get("sec_assign"),
                "sec_commit": stats.get("sec_commit"),
                "probe_files": stats.get("probe_files"),
                "live_files": stats.get("live_files"),
                "probe_frac": (round(stats["probe_files"]
                                     / stats["live_files"], 3)
                               if stats.get("live_files") else None),
            }
            if occ_every and (d + 1) % occ_every == 0:
                rec["occupancy"] = _occupancy(dest)
            print(json.dumps(rec), flush=True)
            state["lo"] = lo + per

    run_deltas("delta", deltas, occ_every=max(deltas // 4, 1))
    if post_resize_deltas:
        from zync_spark.streaming.health import check_embdedup_health

        t0 = time.perf_counter()
        v = check_embdedup_health(dest, SPEC, sample=16,
                                  max_mean_occupancy=max_mean_occupancy)
        print(json.dumps({
            "phase": "health", "sec": round(time.perf_counter() - t0, 1),
            "healthy": v["healthy"], "pair_recall": v["pair_recall"],
            "cells_used": v["cells_used"],
            "mean_cell_occupancy": v["mean_cell_occupancy"],
            "max_cell_occupancy": v["max_cell_occupancy"],
            "rebuild_args": v["rebuild_args"]}), flush=True)
        if v.get("rebuild_args") and "n_cells" in v["rebuild_args"]:
            t0 = time.perf_counter()
            rso: dict = {}
            ED.rebuild_embdedup(dest, SPEC, stats_out=rso,
                                **v["rebuild_args"])
            print(json.dumps({
                "phase": "resize",
                "n_cells": v["rebuild_args"]["n_cells"],
                "sec": round(time.perf_counter() - t0, 1),
                "sec_kmeans": rso.get("sec_kmeans"),
                # round-11 ask #2: the previously unstamped remainder
                "sec_assign": rso.get("sec_assign"),
                "sec_pairs": rso.get("sec_pairs"),
                "sec_rewrite": rso.get("sec_rewrite"),
                "n_assigned": rso.get("n_assigned"),
                "n_pairs": rso.get("n_pairs"),
                "rebuild_occ": {x: rso.get(x) for x in
                                ("cells_used", "mean_cell_occupancy",
                                 "max_cell_occupancy", "cell_balance")},
                "occupancy": _occupancy(dest)}), flush=True)
        run_deltas("delta_post_resize", post_resize_deltas, occ_every=0)
    pairs = ED.pairs_view(dest, SPEC)
    print(json.dumps({"phase": "done", "total_docs": state["lo"],
                      "pairs": pairs.count() if pairs is not None else 0,
                      "occupancy": _occupancy(dest)}))
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    def _arg(x):
        try:
            return float(x) if "." in x else int(x)
        except ValueError:
            return x  # the noise-generator name

    a = [_arg(x) for x in sys.argv[1:]]
    main(*a)
