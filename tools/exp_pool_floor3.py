"""Per-stage decomposition of pooled-layout headline queries via the UI
REST API: task time vs wall gaps (scheduler/driver overhead)."""
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    from zync_spark.queries import HEADLINE, QUERIES, T, _scratch_dir
    from zync_spark.session import get_spark

    spark = get_spark("exp-pf3", shuffle_partitions=8, adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = _scratch_dir("zs-exp-pf3")
    shutil.rmtree(out, ignore_errors=True)
    for t in TABLES:
        df = T(spark, sf_dir, t)
        n = 16 if t in ("lineitem", "orders", "events") else 4
        df.repartition(n).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    QUERIES["q_max_offsets"](spark, out).write.mode("overwrite").format("noop").save()

    def rest(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
            return json.load(r)

    which = sys.argv[1:] or ["q1_pricing_summary", "q5_regional_revenue",
                             "dedup_minhash_lsh", "ann_cosine_topk"]
    for name in which:
        df = QUERIES[name](spark, out)
        # warm twice, then measure
        for _ in range(2):
            df.write.mode("overwrite").format("noop").save()
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_rows = []
        task_ms = 0.0
        for j in jobs:
            for sid in j["stageIds"]:
                for s in rest(f"/stages/{sid}"):
                    if s["status"] != "COMPLETE":
                        continue
                    sub = s["submissionTime"]
                    comp = s["completionTime"]
                    stage_rows.append({
                        "stage": sid, "job": j["jobId"],
                        "tasks": s["numCompleteTasks"],
                        "exec_run_ms": s["executorRunTime"],
                        "cpu_ms": round(s["executorCpuTime"] / 1e6, 1),
                        "sub": sub, "comp": comp,
                        "name": s["name"].split("\n")[0][:40],
                    })
                    task_ms += s["executorRunTime"]
        print(f"== {name} wall={wall*1000:.0f}ms jobs={len(jobs)} "
              f"stages={len(stage_rows)} sum_executorRunTime={task_ms:.0f}ms")
        for r in sorted(stage_rows, key=lambda r: r["stage"]):
            print(f"  stage {r['stage']:>4} job {r['job']:>3} tasks={r['tasks']:>3} "
                  f"run={r['exec_run_ms']:>5}ms cpu={r['cpu_ms']:>7}ms  "
                  f"{r['sub']} .. {r['comp']}  {r['name']}")
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
