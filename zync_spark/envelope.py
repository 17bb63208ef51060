"""The Kafka envelope data model.

Reference: every consumed record becomes
``{kafka:{topic,partition,offset}, key:<any>, value:<any>}``
(fifo/consumer.go:117-148, README.md:124-130), and ETL output pools
interleave data records with ``{kafka:{topic,offset}}(=done)`` marker
records of a different shape (ztests/etl-demo.yaml:30-37).

Zed is per-value typed; Spark DataFrames are homogeneous. The design
decision (SURVEY §1.2): one pool = one table with a *unified* envelope
schema plus a ``zed_type`` discriminator column. ``is(<done>)`` becomes
``zed_type == 'done'``; ``fuse`` becomes unionByName null-padding; named
types survive as the discriminator value. Key/value payloads are struct
columns whose fields are the union of all record shapes seen by the pool
(null-padded), widened at write time with unionByName(allowMissingColumns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

ZED_TYPE_DATA = "data"
ZED_TYPE_DONE = "done"

KAFKA_META_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", LongType()),
        StructField("offset", LongType()),
    ]
)


def kafka_meta(topic: Column | str, offset: Column, partition: Column | None = None) -> Column:
    """Build the kafka metadata struct."""
    t = F.lit(topic) if isinstance(topic, str) else topic
    p = partition if partition is not None else F.lit(0).cast("long")
    return F.struct(
        t.alias("topic"), p.cast("long").alias("partition"), offset.cast("long").alias("offset")
    )


def envelope(kafka: Column, key: Column, value: Column,
             zed_type: str = ZED_TYPE_DATA) -> Column:
    """Assemble a full envelope struct (used when building rows from raw
    Kafka bytes or test fixtures)."""
    return F.struct(
        kafka.alias("kafka"),
        key.alias("key"),
        value.alias("value"),
        F.lit(zed_type).alias("zed_type"),
    )


def done_marker(topic: Column, offset: Column) -> Column:
    """A done-marker envelope: named-type record {kafka:{topic,offset}}(=done)
    (etl/pipeline.go:29, etl/build.go:90). key/value are null."""
    return F.struct(
        kafka_meta(topic, offset).alias("kafka"),
        F.lit(None).alias("key"),
        F.lit(None).alias("value"),
        F.lit(ZED_TYPE_DONE).alias("zed_type"),
    )


def is_type(df_or_col, type_name: str) -> Column:
    """The `is(<T>)` type predicate (etl/build.go:114) on the unified table."""
    return F.col("zed_type") == type_name


def fuse(*dfs: DataFrame) -> DataFrame:
    """`fuse`: merge heterogeneous record shapes into one wide schema with
    null-padding (README.md:487) — unionByName(allowMissingColumns)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
