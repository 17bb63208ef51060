"""Memory-pressure certification of the VECTOR-FAMILY REBUILD path
(round 11, VERDICT ask #1 — the §15 method applied to the one flow the
catalog entries don't cover: sync → occupancy breach → policy resize
with the Arrow int64 Lloyd kernel).

Same constrained profile as tools/mem_cert.py (MEM_CERT_DRIVER=2g,
MEM_CERT_CORES=8, MEM_CERT_RESULT=256m — local mode shares the one JVM
between driver and executors, so the cap constrains the whole engine):
under it the rebuild must degrade to spill, never OOM. What this
certifies beyond §15:

- the retrain caches (`vecs`, `assigned` — MEMORY_AND_DISK via
  Pool.compact's transform materialization and rebuild's persist)
  spill instead of dying when the corpus exceeds the heap share;
- the Arrow kernel's PYTHON-worker allocation — the one the JVM cap
  cannot see — stays bounded: the (rows x k) int64 distance matrix is
  chunked to 2^22 elements (32 MB) per chunk (similarity.
  _kmeans_reassign_arrow, round 11), so worker memory is ~Arrow batch
  + centroid matrix + one chunk at ANY k up to the 65536-cell label
  cap;
- driver-side state stays metadata-sized (k x dim centroid collects)
  — a corpus-sized collect dies loudly against the 256m result cap.

Corpus: the exp_embdedup_scale spark-side generator (identical rows to
the B2 protocol). Default 400,000 docs — ~3x the round-10 B2 evidence
and the resize retrains ~900 cells through the Arrow kernel (k > 64).

Usage: python tools/mem_cert_rebuild.py [n_docs] [max_mean_occupancy]
Prints one JSON line ({"ok", "sec", phases...}); exit 0 iff passed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run_one(n_docs: int, mmo: float) -> int:
    import shutil

    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('MEM_CERT_CORES', '8')}]")
        .appName("zync-spark-mem-cert-rebuild")
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
    jvm_max = spark.sparkContext._jvm.java.lang.Runtime.getRuntime() \
        .maxMemory()
    import tools.exp_embdedup_scale as X
    from zync_spark.pool import Pool
    from zync_spark.queries import _scratch_dir
    from zync_spark.streaming import embdedup_index as ED
    from zync_spark.streaming.health import check_embdedup_health

    X.spark = spark  # the exp module's generator runs on OUR session
    X.GEN = "spark"
    import math

    # B2-protocol shape: quarter backfill + 3 quarter deltas, initial
    # quantizer sized for the BACKFILL (sqrt) — by n_docs it is a
    # decade-class outgrown quantizer and the occupancy gate trips
    quarter = max(n_docs // 4, 1)
    X.SPEC = ED.EmbDedupIndexSpec(
        "x", "value.vec_id", "value.emb",
        n_cells=max(65, int(math.sqrt(quarter))), iterations=2,
        threshold=0.999)
    lake = _scratch_dir("zs-memcert-rebuild")
    shutil.rmtree(lake, ignore_errors=True)
    rec: dict = {"entry": "embdedup_rebuild", "n_docs": n_docs,
                 "n_cells_initial": X.SPEC.n_cells,
                 "jvm_max_heap_mb": round(jvm_max / (1 << 20))}
    t0 = time.perf_counter()
    try:
        src = Pool.create(spark, f"{lake}/src")
        dest = Pool.create(spark, f"{lake}/idx")
        X._load(src, 0, quarter)
        ED.sync_embdedup(src, dest, X.SPEC, ["emb"])
        ED.compact_embdedup(dest, target_rows=max(n_docs // 32, 200))
        for lo in range(quarter, n_docs, quarter):
            X._load(src, lo, min(lo + quarter, n_docs))
            ED.sync_embdedup(src, dest, X.SPEC, ["emb"])
        rec["sec_build"] = round(time.perf_counter() - t0, 1)
        t1 = time.perf_counter()
        v = check_embdedup_health(dest, X.SPEC, sample=8,
                                  max_mean_occupancy=mmo)
        rec["health"] = {
            "healthy": v["healthy"],
            "mean_cell_occupancy": v["mean_cell_occupancy"],
            "rebuild_args": v["rebuild_args"]}
        rso: dict = {}
        assert v["rebuild_args"] and "n_cells" in v["rebuild_args"], \
            "protocol error: occupancy gate did not trip"
        assert v["rebuild_args"]["n_cells"] > 64, \
            "protocol error: resize below the Arrow-kernel gate"
        ED.rebuild_embdedup(dest, X.SPEC, stats_out=rso,
                            **v["rebuild_args"])
        rec["sec_resize"] = round(time.perf_counter() - t1, 1)
        rec["resize"] = {k: rso.get(k) for k in
                        ("sec_kmeans", "sec_assign", "sec_pairs",
                         "sec_rewrite", "n_assigned", "n_pairs",
                         "cells_used", "cell_balance",
                         "mean_cell_occupancy")}
        # one post-resize maintenance pass must also hold under the cap
        X._load(src, n_docs, n_docs + 5000)
        stats: dict = {}
        t2 = time.perf_counter()
        n = ED.sync_embdedup(src, dest, X.SPEC, ["emb"], stats_out=stats)
        rec["post_sync"] = {"rows": n,
                            "sec": round(time.perf_counter() - t2, 1),
                            "probe_files": stats.get("probe_files"),
                            "live_files": stats.get("live_files")}
        rec["ok"] = True
        rec["sec"] = round(time.perf_counter() - t0, 1)
    except Exception as e:  # noqa: BLE001 - the certification records it
        rec["ok"] = False
        rec["sec"] = round(time.perf_counter() - t0, 1)
        rec["error"] = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    print(json.dumps(rec), flush=True)
    return 0 if rec.get("ok") else 1


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--one"]
    n_docs = int(args[0]) if args else 400_000
    mmo = float(args[1]) if len(args) > 1 else 1024.0
    if "--one" in sys.argv:
        return _run_one(n_docs, mmo)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one",
         str(n_docs), str(mmo)],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    out = None
    for line in p.stdout.strip().splitlines():
        try:
            d = json.loads(line)
            if d.get("entry") == "embdedup_rebuild":
                out = d
        except ValueError:
            continue
    if out is None:
        tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
        out = {"entry": "embdedup_rebuild", "ok": False,
               "error": f"child died rc={p.returncode}: "
                        + " | ".join(t[:120] for t in tail)}
    print(json.dumps(out))
    return 0 if out.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
