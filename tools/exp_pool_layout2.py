"""Experiment: where does the pool-layout Spark time go, and do scan
packing knobs (spark.sql.files.minPartitionNum) move it?  Times the
headline set on the multi-file pooled copy under several file-packing
settings, plus DuckDB per-query on the same files."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import TABLES, _materialize
from zync_spark.queries import HEADLINE, ORACLE_SQL, QUERIES, T, _scratch_dir
from zync_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-pool-layout", shuffle_partitions=8, adaptive=False)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

out = _scratch_dir("zs-exp-pooled")
import shutil

shutil.rmtree(out, ignore_errors=True)
for t in TABLES:
    df = T(spark, sf_dir, t)
    n = 16 if t in ("lineitem", "orders", "events") else 4
    df.repartition(n).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

_materialize(QUERIES["q_max_offsets"](spark, out))  # warm

con = duckdb.connect()
con.execute(f"PRAGMA threads={os.cpu_count()}")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet/*.parquet'")

def run_spark(tag):
    tot = 0.0
    per = {}
    for name in HEADLINE:
        runs = []
        for _ in range(4):
            s = time.perf_counter()
            _materialize(QUERIES[name](spark, out))
            runs.append(time.perf_counter() - s)
        per[name] = round(min(runs), 3)
        tot += per[name]
    print(f"== {tag}: total {round(tot,3)}")
    for k, v in per.items():
        print(f"   {k:26s} {v:7.3f}")
    return per

base = run_spark("baseline (minPartitionNum default)")

for mpn in ("8", "4"):
    spark.conf.set("spark.sql.files.minPartitionNum", mpn)
    run_spark(f"minPartitionNum={mpn}")
spark.conf.unset("spark.sql.files.minPartitionNum")

duck = {}
for name in HEADLINE:
    sql = ORACLE_SQL.get(name)
    if sql is None:
        continue
    runs = []
    for _ in range(4):
        s = time.perf_counter()
        con.sql(sql).fetchall()
        runs.append(time.perf_counter() - s)
    duck[name] = round(min(runs), 3)
print("== duck:", round(sum(duck.values()), 3))
for k, v in duck.items():
    print(f"   {k:26s} {v:7.3f}")
shutil.rmtree(out, ignore_errors=True)
