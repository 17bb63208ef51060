"""Measure per-query steady-state floor under session config variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run(tag, confs):
    b = SparkSession.builder.appName(tag).master("local[32]")
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    from zync_spark.queries import QUERIES

    sf = "/root/testdata/sf0.1"
    for name in ["q_group_topk", "q_sessionize", "q5_regional_revenue", "dedup_simhash"]:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(tag, name, runs, flush=True)
    spark.stop()


BASE = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": "8g",
}

if __name__ == "__main__":
    variant = sys.argv[1]
    if variant == "aqe32":
        run("aqe32", {**BASE, "spark.sql.adaptive.enabled": "true",
                      "spark.sql.shuffle.partitions": "32"})
    elif variant == "aqe8":
        run("aqe8", {**BASE, "spark.sql.adaptive.enabled": "true",
                     "spark.sql.shuffle.partitions": "8"})
    elif variant == "noaqe8":
        run("noaqe8", {**BASE, "spark.sql.adaptive.enabled": "false",
                       "spark.sql.shuffle.partitions": "8"})
    elif variant == "noaqe32":
        run("noaqe32", {**BASE, "spark.sql.adaptive.enabled": "false",
                        "spark.sql.shuffle.partitions": "32"})
