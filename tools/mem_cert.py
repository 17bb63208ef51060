"""Memory-pressure certification (round 8, SCALING §15).

The decade ladder (SCALING §9/13/14) proved TIME scaling; this tool
certifies SPACE: the heavy catalog entries run inside a deliberately
CONSTRAINED JVM — driver memory capped (local mode: driver and
executors share the one JVM, so this caps the whole engine), executor
parallelism capped, and `spark.driver.maxResultSize` set low so any
corpus-sized collect dies loudly here long before it kills a
production driver. The 128 GiB sandbox otherwise hides driver-side
accumulation defects, and at 100 TB the driver is the first thing
that dies.

Profile: MEM_CERT_DRIVER=2g / MEM_CERT_CORES=8 / MEM_CERT_RESULT=256m
→ 256 MB of heap per concurrent task. That is a LEGITIMATE (small)
executor sizing; Spark's documented floor is ~512 MB/core and common
production shapes run 1-4 GB/core. Under this profile an operator must
degrade to spill, never OOM — a failure here is an engine defect
(driver accumulation, non-spillable structure, skew blow-up). The same
2 GB spread over 32 threads (16 MB/core — 30x below the documented
floor) is NOT a certification profile: the first gsf10 run at 32
threads OOM'd inside the SMJ spill-reader buffer allocation itself,
i.e. the sizing violated the engine's contract before the operator
could — recorded in SCALING §15 as the negative control.

ISOLATION: each entry runs in its own subprocess with a fresh JVM — a
death cannot poison later entries, and per-entry heap is actually
per-entry.

Usage: python tools/mem_cert.py SF_DIR [entry ...]
Prints one JSON line per entry ({"entry", "ok", "sec" | "error"}) and
a final summary line. Exit 0 iff every entry passed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Heavy by design: the dedup/span/text/ANN batch operators (corpus-wide
# shuffles, HOF-dense scans) and all five incremental index families
# (pool builds + probes + compactions inside one entry). q1 rides along
# as a cheap control — if IT fails, the harness is broken, not the
# operator.
DEFAULT_ENTRIES = [
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_substring_spans",
    "ann_cosine_topk",
    "emb_neardup_lsh",
    "text_tfidf_topk",
    "dedup_index_incremental",
    "span_index_incremental",
    "text_index_incremental",
    "ann_index_incremental",
    "emb_neardup_index_incremental",
]


def _run_one(sf_dir: str, name: str) -> int:
    """Child mode: one entry, one fresh constrained JVM."""
    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('MEM_CERT_CORES', '8')}]")
        .appName(f"zync-spark-mem-cert-{name}")
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
    from zync_spark.queries import QUERIES

    fn = QUERIES.get(name)
    if fn is None:
        print(json.dumps({"entry": name, "ok": False,
                          "error": "unknown entry"}))
        return 1
    t0 = time.perf_counter()
    try:
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        rec = {"entry": name, "ok": True,
               "sec": round(time.perf_counter() - t0, 1),
               "jvm_max_heap_mb": round(jvm_max / (1 << 20))}
    except Exception as e:  # noqa: BLE001 - the certification records it
        msg = str(e).splitlines()[0][:300]
        rec = {"entry": name, "ok": False,
               "sec": round(time.perf_counter() - t0, 1),
               "jvm_max_heap_mb": round(jvm_max / (1 << 20)),
               "error": f"{type(e).__name__}: {msg}"}
    print(json.dumps(rec), flush=True)
    return 0 if rec["ok"] else 1


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--one"]
    if "--one" in sys.argv:
        return _run_one(args[0], args[1])
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_ENTRIES
    results = []
    for name in names:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             sf_dir, name],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        rec = None
        for line in p.stdout.strip().splitlines():
            try:
                d = json.loads(line)
                if d.get("entry") == name:
                    rec = d
            except ValueError:
                continue
        if rec is None:
            # the JVM died hard enough to eat its own report — the
            # stderr tail is the diagnosis
            tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
            rec = {"entry": name, "ok": False,
                   "error": f"child died rc={p.returncode}: "
                            + " | ".join(t[:120] for t in tail)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    ok = sum(1 for r in results if r.get("ok"))
    print(json.dumps({
        "metric": "mem_cert", "passed": ok, "total": len(results),
        "sf_dir": sf_dir,
        "driver_memory": os.environ.get("MEM_CERT_DRIVER", "2g"),
        "cores": os.environ.get("MEM_CERT_CORES", "8"),
        "max_result_size": os.environ.get("MEM_CERT_RESULT", "256m"),
    }))
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
