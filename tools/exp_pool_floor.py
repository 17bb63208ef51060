"""Decompose the pool_layout per-query floor (round-7 ask #1).

Builds the same multi-file layout bench._pool_layout builds, then for each
headline query measures:
  - plan_ms: fresh analysis+optimization+physical planning of the SAME
    logical plan (what every .write action pays, since each action makes a
    new QueryExecution)
  - exec_ms: steady-state noop write (the bench's number)
  - tasks/stages: scheduler volume per materialization (statusTracker)

Levers probed: nothing bench-side — this is a measurement harness to find
where the fixed ~0.1-0.2 s/query goes so the ENGINE can be fixed.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.queries import HEADLINE, QUERIES, T, _scratch_dir
from zync_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    spark = get_spark("exp-pool-floor", shuffle_partitions=8, adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    out = _scratch_dir("zs-exp-pool-floor")
    shutil.rmtree(out, ignore_errors=True)
    for t in TABLES:
        df = T(spark, sf_dir, t)
        n = 16 if t in ("lineitem", "orders", "events") else 4
        df.repartition(n).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    jvm = spark._jvm
    tracker = spark.sparkContext.statusTracker()

    # warmup
    QUERIES["q_max_offsets"](spark, out).write.mode("overwrite").format("noop").save()

    rows = []
    for name in HEADLINE:
        df = QUERIES[name](spark, out)
        # planning cost: fresh QueryExecution each time, like each action pays
        pruns = []
        for _ in range(4):
            t0 = time.perf_counter()
            qe = spark._jsparkSession.sessionState().executePlan(
                df._jdf.queryExecution().logical(),
                jvm.org.apache.spark.sql.execution.CommandExecutionMode.ALL())
            qe.executedPlan()
            pruns.append(time.perf_counter() - t0)
        # steady-state write, with task/stage volume on the best run
        eruns = []
        best_tasks = best_stages = None
        for _ in range(4):
            jids_before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            eruns.append(dt)
            if dt == min(eruns):
                jids = [j for j in (tracker.getJobIdsForGroup(None) or [])
                        if j not in jids_before]
                ntasks = nstages = 0
                for j in jids:
                    ji = tracker.getJobInfo(j)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None:
                            nstages += 1
                            ntasks += si.numTasks
                best_tasks, best_stages = ntasks, nstages
        rows.append({
            "q": name,
            "plan_ms": round(min(pruns) * 1000, 1),
            "exec_ms": round(min(eruns) * 1000, 1),
            "tasks": best_tasks, "stages": best_stages,
        })
        print(json.dumps(rows[-1]), flush=True)

    tot_plan = sum(r["plan_ms"] for r in rows)
    tot_exec = sum(r["exec_ms"] for r in rows)
    print(json.dumps({"total_plan_ms": round(tot_plan, 1),
                      "total_exec_ms": round(tot_exec, 1)}))
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
