"""Memory-pressure certification (round 8, SCALING §15).

The decade ladder (SCALING §9/13/14) proved TIME scaling; this tool
certifies SPACE: the heavy catalog entries run inside a deliberately
CONSTRAINED JVM — `spark.driver.memory=2g` (local mode: driver and
executors share the one JVM, so this caps the whole engine) and
`spark.driver.maxResultSize=256m` (any corpus-sized collect dies loudly
here long before it kills a production driver). The 128 GiB sandbox
otherwise hides driver-side accumulation defects, and at 100 TB the
driver is the first thing that dies.

What a PASS certifies per entry: no driver-side accumulation beyond the
metadata collects the modules document (centroids, codebooks, bucket
lists, cursors — all KB-sized), and shuffle/agg pressure degrades to
spill, not OOM.

Usage: python tools/mem_cert.py SF_DIR [entry ...]
Prints one JSON line per entry ({"entry", "ok", "sec" | "error"}) and a
final summary line. Exit 0 iff every entry passed.

Run from a FRESH shell (the constrained confs must reach JVM launch —
an inherited SparkSession would silently run unconstrained; the tool
refuses if a JVM is already up).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_ENTRIES

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        raise SystemExit("mem_cert: a SparkSession is already up — the "
                         "constrained driver memory would not apply; run "
                         "from a fresh process")
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("zync-spark-mem-cert")
        # the certification knobs — must precede JVM launch
        .config("spark.driver.memory",
                os.environ.get("MEM_CERT_DRIVER", "2g"))
        .config("spark.driver.maxResultSize",
                os.environ.get("MEM_CERT_RESULT", "256m"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # confirm the constraint actually reached the JVM (a stale
    # PYSPARK_SUBMIT_ARGS or running gateway would silently undo it)
    jvm_max = spark.sparkContext._jvm.java.lang.Runtime.getRuntime() \
        .maxMemory()
    print(json.dumps({"jvm_max_heap_mb": round(jvm_max / (1 << 20)),
                      "sf_dir": sf_dir}))

    from zync_spark.queries import QUERIES

    results = []
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            results.append({"entry": name, "ok": False,
                            "error": "unknown entry"})
            print(json.dumps(results[-1]))
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            rec = {"entry": name, "ok": True,
                   "sec": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001 - the certification records it
            msg = str(e).splitlines()[0][:300]
            rec = {"entry": name, "ok": False,
                   "sec": round(time.perf_counter() - t0, 1),
                   "error": f"{type(e).__name__}: {msg}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    ok = sum(1 for r in results if r["ok"])
    print(json.dumps({"metric": "mem_cert", "passed": ok,
                      "total": len(results),
                      "driver_memory": os.environ.get("MEM_CERT_DRIVER",
                                                      "2g"),
                      "max_result_size": os.environ.get("MEM_CERT_RESULT",
                                                        "256m")}))
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
