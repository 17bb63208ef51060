"""Phase decomposition of the ingest path (round 10, VERDICT r9 ask #4):
`ingest_100k` pinned 102-110k rows/s warm but only 54-59k COLD — half of
egress's cold number on the same 100k rows. JVM startup is excluded by
the bench harness, so the gap is somewhere in decode/commit. This runs
the exact bench shape with commit_batch's per-phase stats (sec_resume /
sec_decode / sec_load) for one cold pass and two warm passes, so the
gap is attributable from the output alone (the §18.1 method).

Usage: python tools/profile_ingest.py [sf_dir]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

from pyspark.sql.types import LongType, StringType, StructField, StructType

from zync_spark.pool import Pool
from zync_spark.queries import T, _scratch_dir
from zync_spark.session import get_spark
from zync_spark.sources.filequeue import FileQueue
from zync_spark.streaming.from_kafka import FromKafka

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile-ingest")
spark.sparkContext.setLogLevel("ERROR")

root = _scratch_dir("zs-profile-ingest")
shutil.rmtree(root, ignore_errors=True)
fq = FileQueue(f"{root}/q")
rows = (T(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .limit(100_000).collect())
kschema = {"type": "struct", "fields": [{"field": "ID", "type": "int64"}]}
vschema = {"type": "struct",
           "fields": [{"field": "etype", "type": "string"},
                      {"field": "v", "type": "string"}]}
fq.produce("events", [
    (json.dumps({"schema": kschema,
                 "payload": {"ID": int(r["event_id"])}}).encode(),
     json.dumps({"schema": vschema,
                 "payload": {"etype": r["event_type"],
                             "v": str(r["value"])}}).encode())
    for r in rows
])
key_t = StructType([StructField("ID", LongType())])
val_t = StructType([StructField("etype", StringType()),
                    StructField("v", StringType())])
for i in range(3):
    pool = Pool.create(spark, f"{root}/pool{i}")
    fk = FromKafka(spark, {"events": pool}, key_t, val_t, format="json")
    frame = fq.batch_frame(spark, "events")  # plan build, untimed
    so: dict = {}
    t0 = time.perf_counter()
    committed = fk.commit_batch(frame, stats_out=so)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "pass": "cold" if i == 0 else f"warm{i}",
        "rows": committed.get("events", 0),
        "sec": round(dt, 3),
        "rows_per_sec": round(committed.get("events", 0) / dt),
        **so,
        "sec_other": round(dt - sum(
            so.get(k, 0) for k in
            ("sec_resume", "sec_decode", "sec_load")), 3),
    }), flush=True)
shutil.rmtree(root, ignore_errors=True)
