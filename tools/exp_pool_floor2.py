"""Lever experiments for the pool_layout floor (round-7 ask #1).

Each variant is a FRESH JVM (same flags as bench's session otherwise);
run one variant per invocation: python tools/exp_pool_floor2.py <variant>.
Variants:
  base      — today's bench session
  loc0      — + spark.locality.wait=0
  kryo      — + Kryo serializer (faster broadcast/task ser)
  cachedim  — + persist small tables (<8MB) after read (engine dim cache)
  all       — all of the above
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    variant = sys.argv[1]
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.appName(f"exp-{variant}").master("local[32]")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.autoBroadcastJoinThreshold", str(10 << 20))
         .config("spark.sql.join.preferSortMergeJoin", "false")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.showConsoleProgress", "false"))
    if variant in ("loc0", "all"):
        b = b.config("spark.locality.wait", "0")
    if variant in ("kryo", "all"):
        b = b.config("spark.serializer",
                     "org.apache.spark.serializer.KryoSerializer")
    if variant == "aqe":
        b = (b.config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                     "false")
             .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    from zync_spark.queries import HEADLINE, QUERIES, T, _scratch_dir

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = _scratch_dir(f"zs-exp-pf2-{variant}")
    shutil.rmtree(out, ignore_errors=True)
    for t in TABLES:
        df = T(spark, sf_dir, t)
        n = 16 if t in ("lineitem", "orders", "events") else 4
        df.repartition(n).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    if variant in ("cachedim", "all"):
        import zync_spark.queries as q
        for t in TABLES:
            p = f"{out}/{t}.parquet"
            size = sum(os.path.getsize(os.path.join(p, f))
                       for f in os.listdir(p) if f.endswith(".parquet"))
            if size < 8 << 20:
                df = T(spark, out, t)
                df.persist()
                df.count()

    QUERIES["q_max_offsets"](spark, out).write.mode("overwrite").format("noop").save()

    timings = {}
    for name in HEADLINE:
        df = QUERIES[name](spark, out)
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        print(variant, name, timings[name], flush=True)
    print(variant, "TOTAL", round(sum(timings.values()), 3))
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
