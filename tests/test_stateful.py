"""Golden cross-check for the custom stateful sessionizer: streaming
applyInPandasWithState result == batch gap-split sessions, for every
session the stream can know is closed.

A session closes when a later same-user event arrives more than `gap`
after it, or — for each user's trailing session — when the event-time
timeout fires in the final no-data micro-batch: with a 0s watermark
delay, that's every trailing session with end + gap < global max ts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zync_spark.streaming.batch_bridge import read_events_stream, run_to_memory
from zync_spark.streaming.stateful import sessionize_with_state

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 30


def _batch_sessions(spark):
    from zync_spark.queries import T

    ev = T(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lag("ts").over(w)
    new_sess = (
        F.col("ts").cast("double") - gap.cast("double") > GAP_MIN * 60
    ) | gap.isNull()
    sess = ev.withColumn("__new", new_sess.cast("long")).withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "__sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def test_stateful_sessionize_matches_batch(spark):
    ev = read_events_stream(spark, f"{SF_DIR}/events.parquet").select(
        "user_id", "ts", "value"
    )
    got = run_to_memory(
        sessionize_with_state(ev, gap_minutes=GAP_MIN, watermark="0 seconds"),
        output_mode="append"
    )
    stream_rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got.collect()
    }

    batch = _batch_sessions(spark)
    from zync_spark.queries import T

    max_ts = T(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    w_last = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    horizon = F.lit(max_ts) - F.expr(f"INTERVAL {GAP_MIN} MINUTES")
    closed = batch.withColumn("__rk", F.row_number().over(w_last)).filter(
        (F.col("__rk") > 1) | (F.col("session_end") < horizon)
    )
    batch_rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert len(stream_rows) > 0
    assert stream_rows == batch_rows

    # total_value parity (floats summed in time order on both sides)
    sv = {(r["user_id"], r["session_start"]): r["total_value"] for r in got.collect()}
    bv = {
        (r["user_id"], r["session_start"]): r["total_value"] for r in closed.collect()
    }
    for k, v in sv.items():
        assert abs(v - bv[k]) < 1e-6
