"""Incremental-ETL scale proof: cursor/manifest pruning vs the reference's
full-scan-every-run model (etl/build.go:9-18).

Builds a Raw pool of N commits, processes them all, then appends ONE new
commit and times the next ETL pass twice: with stored cursors (manifest
pruning live) and with cursors suppressed (every commit scanned + full
anti-join — the reference's behavior). Prints one JSON line.

Usage: python tools/bench_incremental.py [n_commits] [rows_per_commit]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.etl import EtlPipeline, load_config
from zync_spark.pool import Pool
from zync_spark.session import get_spark

YAML = """
inputs:
  - topic: events
    pool: Raw
output:
  topic: out
  pool: Out
transforms:
  - type: stateless
    in: events
    out: out
    zed: |
      | out:={key: {id: in.kafka.offset}, value: {v: in.value.v}}
"""


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("bench-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="zs-incr-")
    try:
        raw = Pool.create(spark, os.path.join(root, "Raw"))
        out = Pool.create(spark, os.path.join(root, "Out"))
        pools = {"Raw": raw, "Out": out}
        pipeline = EtlPipeline(spark, load_config(YAML), pools)

        def batch(commit_idx: int):
            lo = commit_idx * rows_per
            return spark.range(lo, lo + rows_per).selectExpr(
                "named_struct('topic', 'events', 'partition', 0L, 'offset', id) AS kafka",
                "named_struct('v', id * 2) AS value",
                "'data' AS zed_type",
            )

        for i in range(n_commits):
            raw.load(batch(i), f"c{i}")
        pipeline.run("backfill")

        # one new commit arrives
        raw.load(batch(n_commits), "new")

        # (a) reference behavior: no cursor, full scan + full anti-join
        stored = Pool.stored_cursors
        Pool.stored_cursors = lambda self: {}
        try:
            t0 = time.perf_counter()
            n_full = pipeline.run("full-scan")
            full_s = time.perf_counter() - t0
        finally:
            Pool.stored_cursors = stored
        # that run committed the new rows; add another commit for (b)
        raw.load(batch(n_commits + 1), "new2")

        # (b) cursor + manifest pruning live
        t0 = time.perf_counter()
        n_pruned = pipeline.run("pruned")
        pruned_s = time.perf_counter() - t0

        cursors = out.stored_cursors()
        kept = len(raw.committed_files(lower_bounds={"events": cursors["events"]}))
        print(
            json.dumps(
                {
                    "metric": "incremental_etl",
                    "n_commits": n_commits + 2,
                    "rows_per_commit": rows_per,
                    "full_scan_sec": round(full_s, 3),
                    "pruned_sec": round(pruned_s, 3),
                    "speedup": round(full_s / pruned_s, 2),
                    "rows_committed": [n_full, n_pruned],
                    "files_after_prune": kept,
                    "files_total": len(raw.committed_files()),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
