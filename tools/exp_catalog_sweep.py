"""Round-11 discovery sweep: time EVERY catalog entry on Spark at a given
scale (default sf0.1) through the noop sink, min-of-N after one warmup,
and print a sorted table. The headline 12 are benched every round; the
other ~150 entries have never been timed individually — this finds plan
outliers hiding outside the bench set.

Usage: python tools/exp_catalog_sweep.py [sf_dir] [reps]
Output: one line per entry "<sec> <build_sec> <name>", slowest first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.queries import QUERIES
from zync_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    # Bench-identical session sizing (see bench.py main()).
    corpus_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    shuffle_parts = 8 if corpus_bytes < 32 << 20 else (
        16 if corpus_bytes < 96 << 20 else 32)
    spark = get_spark("catalog-sweep", shuffle_partitions=shuffle_parts,
                      adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    rows: list[tuple[float, float, float, str]] = []
    for name, fn in QUERIES.items():
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build = time.perf_counter() - t0
            runs = []
            for _ in range(reps + 1):
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            warm = min(runs[1:])
            rows.append((warm, runs[0], build, name))
            print(f"done {name}: warm={warm:.3f} cold={runs[0]:.3f} "
                  f"build={build:.3f}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — survey must finish
            print(f"FAIL {name}: {e}", file=sys.stderr, flush=True)
            rows.append((float("nan"), float("nan"), float("nan"), name))

    rows.sort(key=lambda r: -(r[0] if r[0] == r[0] else 1e9))
    print(f"{'warm_s':>8} {'cold_s':>8} {'build_s':>8}  name")
    for warm, cold_, build, name in rows:
        print(f"{warm:8.3f} {cold_:8.3f} {build:8.3f}  {name}")
    total = sum(r[0] for r in rows if r[0] == r[0])
    print(f"total warm: {total:.2f} s over {len(rows)} entries")


if __name__ == "__main__":
    main()
