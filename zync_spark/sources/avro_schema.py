"""Spark-schema → Avro-schema synthesis with the reference's exact wire
conventions (zavro/schema.go):

- Record names are ``zng_<md5 of the zed-syntax type string>`` so identical
  structures dedupe in a schema registry (zavro/schema.go:58-70). We format
  Spark StructTypes in zed type syntax ({a:int64,b:string}) before hashing,
  which makes the digests byte-identical to the reference's for the same
  logical shape.
- Every record field is wrapped in a ``["null", T]`` union — except fields
  that are themselves null-typed, which stay plain "null"
  (zavro/schema.go:45-51, schema_test.go:59-79).
- A record type that repeats within one schema is emitted once and then
  referenced by name (zavro/schema.go:36-38, schema_test.go:81-117).
- JSON key order matches the Java Avro library for registry dedup:
  type, name, namespace, doc, fields / name, type, default
  (zavro/schema.go:73-125, schema_test.go:13-57).
- time encodes as long with logicalType timestamp-micros; Spark timestamps
  are already µs so the reference's nanos→micros truncation
  (zavro/encoder.go:153-156) is the identity here.
"""

from __future__ import annotations

import hashlib
import json
from collections import OrderedDict

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    NullType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

_ZED_PRIMITIVES: list[tuple[type, str]] = [
    (ByteType, "int8"),
    (ShortType, "int16"),
    (IntegerType, "int32"),
    (LongType, "int64"),
    (FloatType, "float32"),
    (DoubleType, "float64"),
    (StringType, "string"),
    (BooleanType, "bool"),
    (BinaryType, "bytes"),
    (TimestampType, "time"),
    (NullType, "null"),
]

_AVRO_PRIMITIVES = {
    "int8": "int",
    "int16": "int",
    "int32": "int",
    "int64": "long",
    "float32": "float",
    "float64": "double",
    "string": "string",
    "bool": "boolean",
    "bytes": "bytes",
    "null": "null",
}


def zed_type_string(dt: DataType) -> str:
    """Format a Spark type in zed type syntax (the string the reference
    hashes for schema names)."""
    if isinstance(dt, StructType):
        inner = ",".join(f"{f.name}:{zed_type_string(f.dataType)}" for f in dt.fields)
        return "{" + inner + "}"
    if isinstance(dt, ArrayType):
        return "[" + zed_type_string(dt.elementType) + "]"
    from pyspark.sql.types import MapType

    if isinstance(dt, MapType):
        return (
            "|{" + zed_type_string(dt.keyType) + ":"
            + zed_type_string(dt.valueType) + "}|"
        )
    for typ, name in _ZED_PRIMITIVES:
        if isinstance(dt, typ):
            return name
    raise TypeError(f"no zed mapping for Spark type {dt.simpleString()}")


def record_name(dt: StructType) -> str:
    """zng_<md5(zed type string)> (zavro/schema.go:58-70)."""
    return "zng_" + hashlib.md5(zed_type_string(dt).encode()).hexdigest()


def to_avro_schema(dt: StructType, namespace: str = "") -> OrderedDict:
    """Synthesize the Avro record schema for a Spark StructType."""
    seen: set[str] = set()
    return _record_schema(dt, namespace, seen)


def _record_schema(dt: StructType, namespace: str, seen: set[str]) -> OrderedDict:
    name = record_name(dt)
    seen.add(name)
    fields = []
    for f in dt.fields:
        ftype = _field_type(f.dataType, namespace, seen)
        fields.append(
            OrderedDict([("name", f.name), ("type", ftype), ("default", None)])
        )
    return OrderedDict(
        [
            ("type", "record"),
            ("name", name),
            ("namespace", namespace),
            ("doc", f"Created by zync from zng type {zed_type_string(dt)}"),
            ("fields", fields or None),
        ]
    )


def _field_type(dt: DataType, namespace: str, seen: set[str]):
    """Field schema: ["null", T] union, except plain "null" for null-typed
    fields (zavro/schema.go:45-51)."""
    if isinstance(dt, NullType):
        return "null"
    return ["null", _type_schema(dt, namespace, seen)]


def _type_schema(dt: DataType, namespace: str, seen: set[str]):
    if isinstance(dt, StructType):
        name = record_name(dt)
        if name in seen:
            return name  # by-name reference (schema_test.go:81-117)
        return _record_schema(dt, namespace, seen)
    if isinstance(dt, ArrayType):
        return OrderedDict(
            [("type", "array"), ("items", _type_schema(dt.elementType, namespace, seen))]
        )
    if isinstance(dt, TimestampType):
        return OrderedDict([("type", "long"), ("logicalType", "timestamp-micros")])
    zed = zed_type_string(dt)
    return _AVRO_PRIMITIVES[zed]


def schema_json(dt: StructType, namespace: str = "") -> str:
    """Canonical JSON text (Java-compatible key order preserved by the
    OrderedDict construction; 4-space indent like the reference goldens)."""
    return json.dumps(to_avro_schema(dt, namespace), indent=4)


def union_branch_label(schema) -> str:
    """Deterministic field name for a union branch in the tagged-struct
    mapping: the avro type name (records use their record name). Avro
    forbids duplicate unnamed types and same-named records within one
    union, so labels are unique; the raw union index is prefixed anyway
    so the tag ↔ field correspondence is explicit."""
    if isinstance(schema, str):
        return schema
    t = schema.get("type")
    if t == "record":
        return schema["name"]
    return t


def from_avro_schema(schema) -> DataType:
    """Avro schema (parsed JSON) → Spark type. Two-element null unions
    collapse to the plain nullable type (zavro/schema.go:197-224); general
    multi-branch unions — which the reference maps to Zed unions
    (zavro/schema.go:233-244) and Spark has no native type for — map to a
    struct of nullable branch fields plus a `tag` column holding the raw
    union selector index (SURVEY §1.3), mirroring the reference decoder's
    tagged container (zavro/decoder.go:140-161)."""
    from pyspark.sql.types import StructField

    if isinstance(schema, str):
        prim = {
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "string": StringType(),
            "boolean": BooleanType(),
            "bytes": BinaryType(),
            "null": NullType(),
        }
        if schema in prim:
            return prim[schema]
        raise TypeError(f"unresolved schema reference {schema!r} (resolve via registry cache)")
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) == 1:
            return from_avro_schema(branches[0])
        fields = [StructField("tag", LongType())]
        for i, s in enumerate(schema):
            if s == "null":
                continue
            fields.append(
                StructField(f"b{i}_{union_branch_label(s)}", from_avro_schema(s))
            )
        return StructType(fields)
    t = schema.get("type")
    if t == "record":
        return StructType(
            [
                StructField(f["name"], from_avro_schema(f["type"]))
                for f in (schema.get("fields") or [])
            ]
        )
    if t == "array":
        return ArrayType(from_avro_schema(schema["items"]))
    if t == "long" and schema.get("logicalType") == "timestamp-micros":
        return TimestampType()
    return from_avro_schema(t)
