"""FileQueue: a directory-backed stand-in for a Kafka broker.

Implements the same frame contract as the kafka source/sink
(``sources.kafka.FRAME_COLUMNS``: topic, partition, offset, key, value)
over plain files, so the WHOLE ingest/egress machinery — Structured
Streaming ``foreachBatch`` loops, checkpoint-based resume, HWM egress —
runs end-to-end without a broker. Useful for local development
(``zync etl`` against a laptop directory) and for integration tests of
the run loops that the kafka connector would otherwise gate.

Layout: ``root/<topic>/<seq>.jsonl`` — one JSON-lines file per produce
call, each line ``{"topic","partition","offset","key","value"}`` with
key/value base64-encoded bytes. Offsets are assigned by the queue
(monotonic per topic, like a single-partition Kafka topic — the
reference pins partition 0 for FIFO ordering, README.md:198-199).

Scale posture: this is the DEV/TEST transport. The production transport
is the kafka connector (sources/kafka.py) — batched sink writes, source
offset tracking in the streaming checkpoint. The streaming read here
(``stream_frame``) uses Spark's file source, which has the same
checkpoint/exactly-once contract as the kafka source, so the pipeline
code is identical across both transports.
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WIRE_T = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", LongType()),
        StructField("offset", LongType()),
        StructField("key", StringType()),    # base64
        StructField("value", StringType()),  # base64
    ]
)


def _b64(b: bytes | None) -> str | None:
    return None if b is None else base64.b64encode(b).decode("ascii")


class FileQueue:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _topic_dir(self, topic: str) -> str:
        d = os.path.join(self.root, topic)
        os.makedirs(d, exist_ok=True)
        return d

    # -- broker metadata ---------------------------------------------------

    def topics(self) -> list[str]:
        return sorted(
            t for t in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, t))
        )

    def end_offset(self, topic: str) -> int:
        """Next offset to be assigned (Kafka's high-water mark)."""
        d = self._topic_dir(topic)
        hwm = 0
        for name in os.listdir(d):
            if name.endswith(".jsonl"):
                # file name is "<firstoffset>-<count>.jsonl"
                first, count = name[:-6].split("-")
                hwm = max(hwm, int(first) + int(count))
        return hwm

    # -- produce -----------------------------------------------------------

    def produce(self, topic: str, records: list[tuple[bytes | None, bytes | None]]) -> int:
        """Append (key, value) byte pairs; returns the first assigned offset.

        One jsonl file per call — an atomic rename makes the batch visible
        to streaming readers all-at-once (the file source lists whole
        files), mirroring a producer batch.
        """
        d = self._topic_dir(topic)
        first = self.end_offset(topic)
        path = os.path.join(d, f"{first}-{len(records)}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for i, (k, v) in enumerate(records):
                f.write(
                    json.dumps(
                        {
                            "topic": topic,
                            "partition": 0,
                            "offset": first + i,
                            "key": _b64(k),
                            "value": _b64(v),
                        }
                    )
                    + "\n"
                )
        os.rename(tmp, path)
        return first

    def produce_frame(self, frame: DataFrame) -> int:
        """Kafka-sink stand-in for ToKafka.sync pages: appends an encoded
        frame (topic, key, value bytes) to the queue. Pages are
        batch-sized (reference: 200 records, fifo/to.go:29), so the
        driver-side collect here is bounded by design; the production
        transport is sources.kafka.write_batch (fully distributed)."""
        rows = frame.select("topic", "key", "value").collect()
        n = 0
        by_topic: dict[str, list[tuple[bytes | None, bytes | None]]] = {}
        for r in rows:
            by_topic.setdefault(r["topic"], []).append((r["key"], r["value"]))
        for topic, records in by_topic.items():
            self.produce(topic, records)
            n += len(records)
        return n

    # -- consume -----------------------------------------------------------

    def _decode(self, raw: DataFrame) -> DataFrame:
        return raw.select(
            "topic",
            "partition",
            "offset",
            F.unbase64(F.col("key")).cast(BinaryType()).alias("key"),
            F.unbase64(F.col("value")).cast(BinaryType()).alias("value"),
        )

    def stream_frame(self, spark: SparkSession) -> DataFrame:
        """Streaming kafka-frame over the queue (file source: new files are
        new records; the streaming checkpoint remembers processed files,
        giving the same resume semantics as kafka startingOffsets)."""
        raw = (
            spark.readStream.schema(WIRE_T)
            .option("pathGlobFilter", "*.jsonl")
            .json(os.path.join(self.root, "*"))
        )
        return self._decode(raw)

    def batch_frame_at(self, spark: SparkSession, topic: str,
                       first: int, count: int) -> DataFrame:
        """Batch kafka-frame over ONE produced segment — the
        `{first}-{count}.jsonl` file a produce() call wrote. This is the
        per-trigger view the streaming file source hands foreachBatch
        (NEW files only, not the whole queue), for run-loop batch
        drivers that measure or replay one micro-batch at a time without
        holding a streaming checkpoint (bench.py's ingest stream bench,
        round-11 ask #5)."""
        path = os.path.join(self._topic_dir(topic),
                            f"{first}-{count}.jsonl")
        raw = spark.read.schema(WIRE_T).json(path)
        return self._decode(raw)

    def batch_frame(self, spark: SparkSession, topic: str | None = None,
                    starting: int = 0) -> DataFrame:
        """Batch kafka-frame (read everything at or past `starting`)."""
        raw = (
            spark.read.schema(WIRE_T)
            .option("pathGlobFilter", "*.jsonl")
            .json(os.path.join(self.root, "*"))
        )
        df = self._decode(raw)
        if topic is not None:
            df = df.filter(F.col("topic") == topic)
        return df.filter(F.col("offset") >= starting)
