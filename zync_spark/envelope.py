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


def _conform_col(col: Column | None, src, tgt, *, crop: bool, fill: bool,
                 cast: bool) -> Column:
    """Recursively conform one column from src type to tgt type."""
    from pyspark.sql.types import StructType as _St

    if col is None:  # field missing from source: fill with typed null
        return F.lit(None).cast(tgt)
    if not isinstance(tgt, _St) or not isinstance(src, _St):
        return col.cast(tgt) if cast and src != tgt else col
    src_fields = {f.name: f for f in src.fields}
    out: list[Column] = []
    for tf in tgt.fields:
        sf = src_fields.get(tf.name)
        if sf is None and not fill:
            continue
        out.append(
            _conform_col(
                col[tf.name] if sf is not None else None,
                sf.dataType if sf is not None else None,
                tf.dataType, crop=crop, fill=fill, cast=cast,
            ).alias(tf.name)
        )
    if not crop:
        tgt_names = {f.name for f in tgt.fields}
        for sf in src.fields:
            if sf.name not in tgt_names:
                out.append(col[sf.name].alias(sf.name))
    return F.struct(*out)


def _conform(df: DataFrame, schema: StructType, *, crop: bool, fill: bool,
             cast: bool) -> DataFrame:
    src_fields = {f.name: f for f in df.schema.fields}
    cols: list[Column] = []
    for tf in schema.fields:
        sf = src_fields.get(tf.name)
        if sf is None and not fill:
            continue
        cols.append(
            _conform_col(
                df[f"`{tf.name}`"] if sf is not None else None,
                sf.dataType if sf is not None else None,
                tf.dataType, crop=crop, fill=fill, cast=cast,
            ).alias(tf.name)
        )
    if not crop:
        tgt_names = {f.name for f in schema.fields}
        for sf in df.schema.fields:
            if sf.name not in tgt_names:
                cols.append(df[f"`{sf.name}`"])
    return df.select(*cols)


def shape(df: DataFrame, schema: StructType) -> DataFrame:
    """Zed `shape(<type>)`: cast + fill + crop + order the frame to the
    target record type (the shaper verb the reference splices around ETL
    programs, cli/shaper.go:8-22). Recursive through nested structs; a
    pure projection, so it collapses into the scan stage."""
    return _conform(df, schema, crop=True, fill=True, cast=True)


def crop(df: DataFrame, schema: StructType) -> DataFrame:
    """Zed `crop(<type>)`: drop fields not present in the target type; no
    casting, no filling. Field order follows the target for kept fields."""
    return _conform(df, schema, crop=True, fill=False, cast=False)


def fill(df: DataFrame, schema: StructType) -> DataFrame:
    """Zed `fill(<type>)`: add typed-null columns for target fields the
    source lacks; extra source fields are kept (appended after)."""
    return _conform(df, schema, crop=False, fill=True, cast=False)


def order_fields(df: DataFrame, schema: StructType) -> DataFrame:
    """Zed `order(<type>)`: reorder fields to the target type's order;
    extras keep their relative order after the ordered prefix."""
    return _conform(df, schema, crop=False, fill=False, cast=False)


def flatten_dotted(df: DataFrame, sep: str = ".") -> DataFrame:
    """Shaper op: recursively expand struct columns into top-level columns
    with dotted names (`kafka.topic`, `value.after.ID`). The inverse of
    `nest_dotted`. Zed's shaper surface exposes this record restructuring
    (the reference splices shaper scripts around its ETL programs,
    cli/shaper.go:8-22); Kafka Connect emits dotted field names that the
    nested envelope model needs to absorb both ways.

    Pure projection — no shuffle, column pruning still reaches the scan
    (Catalyst sees plain GetStructField chains)."""
    from pyspark.sql.types import StructType as _St

    def leaves(prefix: str, dtype, col: Column):
        if isinstance(dtype, _St):
            for f in dtype.fields:
                yield from leaves(f"{prefix}{sep}{f.name}", f.dataType, col[f.name])
        else:
            yield col.alias(prefix)

    cols: list[Column] = []
    for f in df.schema.fields:
        cols.extend(leaves(f.name, f.dataType, df[f.name]))
    return df.select(*cols)


def nest_dotted(df: DataFrame, sep: str = ".") -> DataFrame:
    """Shaper op: group top-level columns whose names contain `sep` into
    nested structs — zed `nest_dotted()` (the standard fix-up for Kafka
    Connect's flattened dotted names). `a.b.c` and `a.b.d` become one
    struct column `a` with nested `b.{c,d}`. Column order is preserved by
    first appearance. Pure projection, no shuffle."""

    def build(tree: dict, path: str) -> list[Column]:
        cols = []
        for name, node in tree.items():
            if isinstance(node, dict):
                cols.append(
                    F.struct(*build(node, f"{path}{name}{sep}")).alias(name)
                )
            else:
                cols.append(node.alias(name))
        return cols

    tree: dict = {}
    for f in df.schema.fields:
        parts = f.name.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"nest_dotted: {f.name!r} collides with a leaf")
        node[parts[-1]] = df[f"`{f.name}`"]
    return df.select(*build(tree, ""))
