"""DataFrame-level Avro bridge: envelope rows ↔ Confluent-framed Kafka
bytes, with registry integration.

Spark-native ``from_avro``/``to_avro`` (the zero-copy JVM path) is used when
the spark-avro datasource is on the classpath; otherwise the bridge falls
back to the pure-Python codec in an Arrow-batched mapInPandas stage. Either
way the wire bytes are identical: Confluent framing + the schema JSON from
avro_schema (md5 names, nullable unions).

Reference: zavro/encoder.go:29-66 (encode+register), zavro/decoder.go:35-52
(unframe+lookup+decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType

from zync_spark.sources import avro_codec
from zync_spark.sources.avro_schema import record_name, schema_json, to_avro_schema
from zync_spark.sources.registry import BaseRegistry


def spark_avro_available(spark) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.avro.functions  # noqa: B018
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        jvm_class = spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return jvm_class is not None
    except Exception:
        return False


def encode_column(df: DataFrame, col: str, schema: StructType,
                  registry: BaseRegistry, namespace: str = "") -> DataFrame:
    """Replace struct column `col` with Confluent-framed Avro bytes.

    The schema is registered once per (type, subject) on the driver —
    mirroring the reference's register-on-first-use with caching
    (zavro/encoder.go:37-57) — so executors never talk to the registry.
    """
    avro = to_avro_schema(schema, namespace)
    sid = registry.register(record_name(schema), schema_json(schema, namespace))

    out_schema = StructType(
        [f if f.name != col else type(f)(col, BinaryType()) for f in df.schema.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[col] = [
                avro_codec.encode_record(avro, row, sid) if row is not None else None
                for row in pdf[col]
            ]
            yield pdf

    return df.mapInPandas(batches, out_schema)


def decode_column(df: DataFrame, col: str, reader_schema: StructType,
                  registry: BaseRegistry) -> DataFrame:
    """Replace Confluent-framed bytes column `col` with a struct decoded
    through the registry (writer schema by embedded id), projected onto
    `reader_schema` by field name with null-padding — the unified-envelope
    read path for heterogeneously-typed topics (SURVEY §1.2)."""
    out_schema = StructType(
        [f if f.name != col else type(f)(col, reader_schema) for f in df.schema.fields]
    )
    reg = registry

    def project(value: dict | None, dt: StructType):
        if value is None:
            return None
        out = []
        for f in dt.fields:
            v = value.get(f.name)
            if isinstance(f.dataType, StructType):
                v = project(v, f.dataType)
            out.append(v)
        return tuple(out)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, dict] = {}
        for pdf in it:
            decoded = []
            for data in pdf[col]:
                if data is None:
                    decoded.append(None)
                    continue
                sid, _ = avro_codec.unframe(bytes(data))
                if sid not in cache:
                    cache[sid] = reg.lookup(sid)
                value = avro_codec.decode_record(cache[sid], bytes(data))
                decoded.append(project(value, reader_schema))
            pdf = pdf.copy()
            pdf[col] = decoded
            yield pdf

    return df.mapInPandas(batches, out_schema)


def strip_confluent_header(col):
    """Column-level unframe for the JVM from_avro path:
    substring past the 5-byte header (SURVEY §2.1 Avro-decode mapping)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.expr(f"substring({col}, 6, length({col}) - 5)") if isinstance(col, str) else c
