"""to-kafka: pool → topic egress from the Kafka high-water mark
(cmd/zync/to-kafka/command.go:20-104, fifo/to.go:29-55, SURVEY §3.3).

Resume: the Kafka end-offset (HWM) per topic tells us how much of the pool
has already been produced; scan the pool at offset >= HWM, page through it
in offset order, encode, produce, advance. The reference pages 200 records
per lake query and produces synchronously one record at a time
(fifo/to.go:29, fifo/producer.go:96-100); here a page is one DataFrame
written through the kafka sink in a single batched call.

The producer is injected as a callable (frame_df → None) so the sync logic
is testable without a broker; the real sink is sources.kafka.write_batch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from zync_spark.pool import Pool
from zync_spark.sources import connectjson
from zync_spark.sources.avro import encode_column
from zync_spark.sources.registry import BaseRegistry

BATCH_SIZE = 200  # reference default, fifo/to.go:29


class ToKafka:
    def __init__(
        self,
        pool: Pool,
        key_schema: StructType,
        value_schema: StructType,
        registry: BaseRegistry | None = None,
        format: str = "avro",
        batch_size: int = BATCH_SIZE,
        shaper: str | None = None,
    ):
        self.pool = pool
        self.key_schema = key_schema
        self.value_schema = value_schema
        self.registry = registry
        self.format = format
        self.batch_size = batch_size
        # Egress shaper (the reference's `... | head N | shaper | sort`
        # lake-query slot, fifo/lake.go:84-92): a zed pipeline applied to
        # each page AFTER cursor bookkeeping — so a filtering shaper can
        # never under-advance the cursor and lose records (the reference's
        # advance-by-batch-length would) — and BEFORE encode, so the shaped
        # rows must still carry the envelope columns (kafka, key, value).
        self.shaper = shaper

    def _shaped(self, page: DataFrame) -> DataFrame:
        if not self.shaper:
            return page
        from zync_spark.zedpipe import compile_pipeline

        return compile_pipeline(page, self.shaper)

    def encode_frame(self, env: DataFrame) -> DataFrame:
        """envelope rows → kafka frame (topic, key bytes, value bytes)."""
        frame = env.select(
            F.col("kafka.topic").alias("topic"),
            F.col("kafka.offset").alias("offset"),
            "key",
            "value",
        )
        if self.format == "avro":
            if self.registry is None:
                raise ValueError("avro format needs a schema registry")
            frame = encode_column(frame, "key", self.key_schema, self.registry)
            frame = encode_column(frame, "value", self.value_schema, self.registry)
        elif self.format == "json":
            frame = frame.withColumn(
                "key", connectjson.encode(F.col("key"), self.key_schema).cast("binary")
            ).withColumn(
                "value", connectjson.encode(F.col("value"), self.value_schema).cast("binary")
            )
        else:
            raise ValueError(f"unknown format {self.format!r}")
        return frame

    def sync(self, topic: str, hwm: int,
             produce: Callable[[DataFrame], None],
             partition: int | None = None) -> int:
        """Produce pool records of `topic` with offset >= hwm, in offset
        order, paged by batch_size; returns records produced. Exits when
        the pool is drained (fifo/to.go:42-53).

        With `partition=None` (default) egress keeps the reference's
        single-partition contract (the HWM is one offset sequence,
        fifo/consumer.go:59-63): records from other partitions in the
        page are an error, never silently mis-ordered. With an explicit
        `partition`, only that partition's sequence is produced (see
        sync_partitions for the multi-partition driver). Offsets may have
        gaps (compaction, transaction markers), so the cursor advances to
        max(page offset)+1 — never by row count. Each page is persisted
        so bookkeeping and produce see the SAME rows even if the pool
        advances mid-page, and the scan is manifest-pruned by the cursor
        (O(new data), not O(pool size))."""
        from zync_spark.envelope import ZED_TYPE_DATA

        produced = 0
        offset = hwm
        while True:
            df = self.pool.scan(lower_bounds={topic: offset})
            if df is None:
                return produced
            pred = (
                (F.col("zed_type") == ZED_TYPE_DATA)
                & (F.col("kafka.topic") == topic)
                & (F.col("kafka.offset") >= offset)
            )
            if partition is not None:
                pred = pred & (F.col("kafka.partition") == partition)
            page = (
                df.filter(pred).orderBy(F.col("kafka.offset")).limit(self.batch_size)
            ).persist()
            try:
                stats = page.agg(
                    F.count("*").alias("n"),
                    F.max(F.col("kafka.offset")).alias("mx"),
                    F.sum((F.col("kafka.partition") != 0).cast("long")).alias("np"),
                ).collect()[0]
                if stats["n"] == 0:
                    return produced
                if partition is None and stats["np"]:
                    raise ValueError(
                        f"to-kafka {topic}: page contains records from "
                        "partitions other than 0; single-HWM egress cannot "
                        "order them (use sync_partitions with per-partition "
                        "HWMs)"
                    )
                produce(self.encode_frame(self._shaped(page)))
                produced += stats["n"]
                offset = int(stats["mx"]) + 1
            finally:
                page.unpersist()

    def sync_partitions(
        self,
        topic: str,
        hwms: dict[int, int],
        produce: Callable[[DataFrame], None],
        bulk: bool = False,
        page_span: int = 100_000,
    ) -> dict[int, int]:
        """Multi-partition egress: each Kafka partition is an independent
        offset sequence with its own high-water mark, exactly mirroring
        from_kafka's per-(topic, partition) resume. The reference never
        grew past partition 0 (fifo/consumer.go:59-63); this is the
        completion of that contract. Partitions sync independently (order
        only matters within a partition — Kafka's own guarantee), so at
        scale the per-partition loops are embarrassingly parallel across
        submitting threads if needed. Returns {partition: produced}."""
        out: dict[int, int] = {}
        for p, hwm in sorted(hwms.items()):
            if bulk:
                out[p] = self.sync_bulk(
                    topic, hwm, produce, page_span=page_span, partition=p
                )
            else:
                out[p] = self.sync(topic, hwm, produce, partition=p)
        return out

    def sync_bulk(self, topic: str, hwm: int,
                  produce: Callable[[DataFrame], None],
                  page_span: int = 100_000,
                  partition: int | None = None) -> int:
        """Bulk-backfill egress: offset-RANGE pages instead of row-count
        pages.

        The reference's 200-row pages (fifo/to.go:29) are the right shape
        for tailing a CDC stream but the wrong one for backfill: one
        produce round-trip per 200 records is O(pool/200) Spark jobs. Here
        a page is an offset span (default 100k): page boundaries are
        arithmetic (no orderBy+limit top-k query per page), each page's
        read is manifest-pruned by the span's lower bound and row-group-
        pruned by the range filter (files are offset-sorted at write
        time), and only the bounded page is ever sorted — never the pool.
        Ordering/cursor contract matches sync(): single-partition HWM,
        offset gaps are fine (an empty span just produces nothing and the
        cursor strides on).
        """
        from zync_spark.envelope import ZED_TYPE_DATA

        df = self.pool.scan(lower_bounds={topic: hwm})
        if df is None:
            return 0
        base_pred = (
            (F.col("zed_type") == ZED_TYPE_DATA)
            & (F.col("kafka.topic") == topic)
        )
        if partition is not None:
            base_pred = base_pred & (F.col("kafka.partition") == partition)
        recs = df.filter(base_pred & (F.col("kafka.offset") >= hwm))
        stats = recs.agg(
            F.count("*").alias("n"),
            F.max(F.col("kafka.offset")).alias("mx"),
            F.sum((F.col("kafka.partition") != 0).cast("long")).alias("np"),
        ).collect()[0]
        if not stats["n"]:
            return 0
        if partition is None and stats["np"]:
            raise ValueError(
                f"to-kafka {topic}: pool contains records from partitions "
                "other than 0; single-HWM egress cannot order them "
                "(use sync_partitions with per-partition HWMs)"
            )
        produced, lo, mx = 0, hwm, int(stats["mx"])
        while lo <= mx:
            hi = lo + page_span
            page_scan = self.pool.scan(lower_bounds={topic: lo})
            page = page_scan.filter(
                base_pred
                & (F.col("kafka.offset") >= lo)
                & (F.col("kafka.offset") < hi)
            ).orderBy(F.col("kafka.offset")).persist()
            try:
                n = page.count()
                if n:
                    produce(self.encode_frame(self._shaped(page)))
                    produced += n
            finally:
                page.unpersist()
            lo = hi
        return produced
