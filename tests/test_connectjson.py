"""Connect-JSON round-trip property tests mirroring the reference corpus
(connectjson/connectjson_test.go:13-47, FIXTURES.md §4): Decode(Encode(v))
must be identity for representative values including nulls, nested
Debezium-shaped records, and typed nulls."""

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

from zync_spark.sources.connectjson import (
    connect_schema,
    decode,
    encode,
    from_connect_schema,
)

S, Fld = StructType, StructField

PRIM_SCHEMA = S(
    [
        Fld("i8", ByteType()),
        Fld("i16", ShortType()),
        Fld("i32", IntegerType()),
        Fld("i64", LongType()),
        Fld("f32", FloatType()),
        Fld("f64", DoubleType()),
        Fld("ok", BooleanType()),
        Fld("s", StringType()),
        Fld("b", BinaryType()),
    ]
)

# Debezium addresses envelope shape (connectjson_test.go:30)
ADDRESS = S(
    [
        Fld("id", IntegerType()),
        Fld("customer_id", IntegerType()),
        Fld("street", StringType()),
        Fld("city", StringType()),
        Fld("state", StringType()),
        Fld("zip", StringType()),
        Fld("type", StringType()),
    ]
)
DEBEZIUM = S(
    [
        Fld("before", ADDRESS),
        Fld("after", ADDRESS),
        Fld("op", StringType()),
        Fld("ts_ms", LongType()),
    ]
)


@pytest.mark.parametrize(
    "schema,row",
    [
        (PRIM_SCHEMA, (8, 16, 32, 64, 32.5, 64.5, True, "abcd", b"\x01\x23\x45")),
        (PRIM_SCHEMA, (None,) * 9),
        (
            DEBEZIUM,
            (
                None,
                (10, 7, "Main St", "Springfield", "OR", "97477", "SHIPPING"),
                "c",
                1700000000000,
            ),
        ),
    ],
)
def test_roundtrip(spark, schema, row):
    df = spark.createDataFrame([(row,)], S([Fld("v", schema)]))
    wire = df.select(encode(F.col("v"), schema).alias("w"))
    text = wire.collect()[0]["w"]
    doc = json.loads(text)
    assert set(doc.keys()) == {"schema", "payload"}
    assert doc["schema"]["type"] == "struct"
    back = wire.select(decode(F.col("w"), schema).alias("v")).collect()[0]["v"]
    orig = df.collect()[0]["v"]
    assert back == orig


ARRMAP = S(
    [
        Fld("tags", ArrayType(StringType())),
        Fld("scores", ArrayType(DoubleType())),
        Fld("attrs", MapType(StringType(), LongType())),
        Fld("nested", ArrayType(S([Fld("k", StringType()), Fld("n", LongType())]))),
    ]
)


@pytest.mark.parametrize(
    "row",
    [
        (
            ["a", "b"],
            [1.5, -2.0],
            {"x": 1, "y": 2},
            [("k1", 10), ("k2", None)],
        ),
        ([], [], {}, []),
        (None, None, None, None),
    ],
)
def test_roundtrip_arrays_and_maps(spark, row):
    """Beyond-reference: array- and map-bearing payloads decode instead of
    raising (the reference errors, connectjson.go:252-255)."""
    df = spark.createDataFrame([(row,)], S([Fld("v", ARRMAP)]))
    wire = df.select(encode(F.col("v"), ARRMAP).alias("w"))
    text = wire.collect()[0]["w"]
    doc = json.loads(text)
    types = {f["field"]: f["type"] for f in doc["schema"]["fields"]}
    assert types == {"tags": "array", "scores": "array", "attrs": "map",
                     "nested": "array"}
    back = wire.select(decode(F.col("w"), ARRMAP).alias("v")).collect()[0]["v"]
    assert back == df.collect()[0]["v"]
    # schema-on-read: the embedded schema alone reconstructs the Spark type
    assert from_connect_schema(doc["schema"]) == S(
        [Fld(f.name, f.dataType) for f in ARRMAP.fields]
    )


def test_from_connect_schema_primitives():
    assert from_connect_schema(connect_schema(PRIM_SCHEMA)) == PRIM_SCHEMA


def test_schema_object_shape():
    cs = connect_schema(PRIM_SCHEMA)
    types = {f["field"]: f["type"] for f in cs["fields"]}
    assert types == {
        "i8": "int8", "i16": "int16", "i32": "int32", "i64": "int64",
        "f32": "float", "f64": "double", "ok": "boolean", "s": "string",
        "b": "bytes",
    }
    assert all(f["optional"] for f in cs["fields"])
    assert cs["name"].startswith("zng.zng_")


def test_bytes_base64(spark):
    """Connect JSON carries bytes base64-encoded (connectjson.go:59-60)."""
    schema = S([Fld("b", BinaryType())])
    df = spark.createDataFrame([((b"\x01\x23\x45\x67\x89",),)], S([Fld("v", schema)]))
    text = df.select(encode(F.col("v"), schema).alias("w")).collect()[0]["w"]
    assert json.loads(text)["payload"]["b"] == "ASNFZ4k="


def test_null_payload(spark):
    schema = S([Fld("x", LongType())])
    df = spark.createDataFrame([(None,)], S([Fld("v", schema)]))
    text = df.select(encode(F.col("v"), schema).alias("w")).collect()[0]["w"]
    assert json.loads(text)["payload"] is None
    back = (
        df.select(encode(F.col("v"), schema).alias("w"))
        .select(decode(F.col("w"), schema).alias("v"))
        .collect()[0]["v"]
    )
    assert back is None
