"""Micro-benchmark: rebalance_for_compute's partition probe.

df.rdd.getNumPartitions() (round-5 implementation) vs the plan-side
queryExecution().toRdd().getNumPartitions() (round-6): both plan the
scan, but df.rdd adds the javaToPython Python-serializer wrapping and
an extra py4j hop per fresh plan. Run: python tools/exp_partition_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

from zync_spark.session import get_spark  # noqa: E402
from zync_spark.pool import _plan_num_partitions  # noqa: E402

spark = get_spark()
base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
src = os.path.join(base, "documents.parquet")


def fresh():
    return spark.read.parquet(src).select("doc_id", "text")


fresh().rdd.getNumPartitions()  # JVM warm-up
N = 20
for name, fn in [
    ("df.rdd (old)", lambda d: d.rdd.getNumPartitions()),
    ("plan toRdd (new)", lambda d: _plan_num_partitions(d)),
]:
    t = time.time()
    for _ in range(N):
        n = fn(fresh())
    print(f"{name}: {round((time.time() - t) / N * 1000, 2)} ms/probe "
          f"(fresh plan, -> {n} partitions)", flush=True)
