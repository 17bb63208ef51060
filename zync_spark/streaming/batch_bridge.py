"""Run streaming plans against file sources with the availableNow trigger —
the test/verification path for streaming semantics without a Kafka broker.

The reference's ingest loop is micro-batching by construction (thresh/interval
commits, cmd/zync/from-kafka/command.go:246-293); Structured Streaming's
micro-batch engine is the direct analog. Plans here use the same `window()`
expressions as the batch catalog so batch oracle == streaming result.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the events parquet with the nanos→micros conversion
    applied (same semantics as the batch loader, queries.T).

    The parquet ts column is physical TIMESTAMP(NANOS); what the reader
    yields is version-dependent (<=4.0 honors the nanosAsLong legacy conf
    and yields a nanos long; 4.1+ ignores it and yields timestamp_ntz,
    already floor-truncated to micros). A streaming source needs the schema
    declared up front, so probe with one batch footer read and declare
    whichever ts type this runtime actually produces.

    FileStreamSource requires a directory; when given a single parquet file
    we expose it through a temp directory of symlinks (read-only source data
    is never copied or touched)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(path).schema["ts"].dataType
    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="zs-stream-src-")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    raw = (
        spark.readStream.schema(_events_schema(probed))
        .format("parquet")
        .load(path)
    )
    if isinstance(probed, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(stream_df: DataFrame, name: str | None = None,
                  output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink and return the result table."""
    spark = stream_df.sparkSession
    qname = name or f"zs_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="zs-ckpt-")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def run_windowed_count(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming tumbling-window count (1h windows, 1h watermark)."""
    ev = read_events_stream(spark, events_path)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    res = run_to_memory(agg, output_mode="complete")
    return res.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
    )
