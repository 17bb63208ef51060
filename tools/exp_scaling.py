"""Scale-curve experiment: how operator wall-clock grows with corpus size.

Runs a representative operator set at every sf the testdata ships
(sf0.001 → sf0.01 → sf0.1, a 100× span) in ONE warm session with the
engine's default config, min-of-3 per point, and reports the 100× ratio:
wall(sf0.1) / wall(sf0.001). A shuffle-light plan should grow far slower
than the 100× data growth at these sizes because fixed per-query cost
(scheduling, codegen reuse, driver round-trips) dominates small inputs —
the measured ratio IS the evidence that the plans are data-bound, not
structure-bound (a quadratic candidate generator or a driver-side loop
would blow past 100× instead).

Prints one JSON line: {op: {sf: sec, ..., "ratio_100x": r}}.
Findings land in SCALING.md §5.

Usage: python tools/exp_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.queries import QUERIES
from zync_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# A cross-section of plan shapes: two-phase agg, star join, inverted-index
# dedup, map-side LSH, window analytics, text HOFs, vector fold.
OPS = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "dedup_crossdoc_fraction",
    "text_stats",
    "q_scd2_intervals",
    "ann_cosine_topk",
    # round-3 additions: synthesized-partsupp star, range-distributed
    # exact ranks, passage dedup, PQ encode+score
    "q2_min_cost_supplier",
    "q_ntile_deciles",
    "dedup_passages",
    "ann_pq_topk",
    # round-4 additions: the two incremental index pipelines (these RUN
    # their pool syncs at call time, so the curve covers the full
    # build+query path, not just a plan)
    "dedup_index_incremental",
    "ann_index_incremental",
    # round-5: the third index family (build O(corpus) by definition;
    # the bounded part is the per-query probe, pinned in its tests)
    "text_index_incremental",
    # round-5 session 4: ExactSubstr span family (windowed-hash inverted
    # index + island merge; removal adds a doc_id join + JVM HOF filter)
    # and the Misra-Gries heavy-hitters sketch (capacity-bounded summary
    # rows per partition; the exact-top-10 harness dominates its cost at
    # bench scale — the sketch side alone is the 100 TB path)
    "dedup_substring_spans",
    "dedup_span_removal",
    "q_approx_topk",
]


def main() -> None:
    # Dirs may be overridden on the CLI (round 5: the generated
    # .localdata/gsf0.01 gsf0.1 gsf1 ladder from tools/gen_sf.py extends
    # the curve a decade past the shipped corpus). The reported ratio is
    # last-dir / first-dir, labeled by the span.
    sfs = sys.argv[1:] or SFS
    global OPS
    if os.environ.get("SPARK_GRAFT_OPS"):
        # round-6 gsf10 run: subset the op list (the two planted-corpus
        # quadratics and the triple-rebuild entry are named and bounded
        # in SCALING §9; re-running them a decade up buys no new
        # information at hours of wall)
        keep = set(os.environ["SPARK_GRAFT_OPS"].split(","))
        OPS = [o for o in OPS if o in keep]
    spark = get_spark("zync-spark-exp-scaling", shuffle_partitions=8,
                      adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen/JIT once
    QUERIES["q1_pricing_summary"](spark, sfs[0]).write.mode(
        "overwrite").format("noop").save()

    tags = [d.rstrip("/").rsplit("/", 1)[-1] for d in sfs]
    out: dict[str, dict] = {}
    for op in OPS:
        row: dict[str, float] = {}
        for sf_dir, tag in zip(sfs, tags):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[op](spark, sf_dir).write.mode(
                    "overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            row[tag] = round(min(runs), 3)
        row[f"ratio_{tags[-1]}/{tags[0]}"] = round(
            row[tags[-1]] / max(row[tags[0]], 1e-9), 2)
        out[op] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
