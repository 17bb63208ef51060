"""Kafka Connect JSON bridge: ``{"schema": {...}, "payload": {...}}``.

Encode synthesizes the Connect schema object from the Spark StructType once
(driver-side) and embeds it as a literal; the payload is `to_json` of the
struct — the whole encode is a JVM Column expression, no Python in the hot
path. Decode is schema-on-read: `from_json(get_json_object(value,
'$.payload'), schema)`, exactly the shaper-based decode of the reference
(connectjson/connectjson.go:185-228 — parse payload generically, then cast
into the schema's shape).

Type mapping (connectjson/connectjson.go:102-155): int8..int64, float,
double, boolean, string, bytes (base64 — Spark's to_json/from_json already
base64-codes BinaryType), struct with named fields; all fields optional.

Beyond the reference: arrays ({"type":"array","items":...}) and maps
({"type":"map","keys":...,"values":...}) are supported on BOTH sides —
the reference's schema decoder errors on them ("array type unimplemented",
connectjson.go:252-255) even though its value walker can traverse maps
(connectjson.go:402-418). Map payloads use the JSON-object form (keys
serialized as strings, as Spark's to_json/from_json do); the Connect
list-of-pairs form for non-string keys is not emitted.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
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
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from zync_spark.sources.avro_schema import record_name

_CONNECT_PRIMITIVES = [
    (ByteType, "int8"),
    (ShortType, "int16"),
    (IntegerType, "int32"),
    (LongType, "int64"),
    (TimestampType, "int64"),  # connectjson.go:119 — time as int64
    (FloatType, "float"),
    (DoubleType, "double"),
    (BooleanType, "boolean"),
    (StringType, "string"),
    (BinaryType, "bytes"),
]


def connect_schema(dt: DataType, name: str | None = None,
                   names: dict[str, str] | None = None,
                   _path: str = "") -> dict:
    """Spark type → Connect schema object (connectjson.go:95-155).

    `names` maps dotted field paths ("" = root) to zed named-type
    decorations; a decorated path's schema node carries its `name` field,
    exactly how the reference rides nested TypeNamed decorators on the
    wire (connectjson.go:99-101 encode, :269-271 decode). Undecorated
    structs keep the synthetic "zng.<digest>" name (Connect requires
    record names; schema_names() filters them back out)."""
    decor = (names or {}).get(_path)
    if isinstance(dt, StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    **connect_schema(
                        f.dataType, names=names,
                        _path=f"{_path}.{f.name}" if _path else f.name),
                    "field": f.name,
                    "optional": True,
                }
                for f in dt.fields
            ],
            "optional": True,
            "name": decor or name or ("zng." + record_name(dt)),
        }
    if isinstance(dt, ArrayType):
        return {
            "type": "array",
            "items": connect_schema(dt.elementType),
            "optional": True,
            **({"name": decor} if decor else {}),
        }
    if isinstance(dt, MapType):
        return {
            "type": "map",
            "keys": connect_schema(dt.keyType),
            "values": connect_schema(dt.valueType),
            "optional": True,
            **({"name": decor} if decor else {}),
        }
    for typ, tname in _CONNECT_PRIMITIVES:
        if isinstance(dt, typ):
            return {"type": tname, "optional": True,
                    **({"name": decor} if decor else {})}
    raise TypeError(f"no connect mapping for {dt.simpleString()}")


_CONNECT_TO_SPARK = {
    "int8": ByteType(),
    "int16": ShortType(),
    "int32": IntegerType(),
    "int64": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "boolean": BooleanType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def from_connect_schema(cs: dict) -> DataType:
    """Connect schema object → Spark type, for schema-on-read of payloads
    whose embedded schema is the only type source. Covers the reference's
    decoder surface (connectjson.go:230-268) PLUS arrays and maps, which
    the reference leaves unimplemented (connectjson.go:252-255)."""
    t = cs.get("type")
    if t == "struct":
        return StructType(
            [
                StructField(f["field"], from_connect_schema(f))
                for f in cs.get("fields") or []
            ]
        )
    if t == "array":
        return ArrayType(from_connect_schema(cs["items"]))
    if t == "map":
        return MapType(
            from_connect_schema(cs["keys"]), from_connect_schema(cs["values"])
        )
    if t in _CONNECT_TO_SPARK:
        return _CONNECT_TO_SPARK[t]
    raise TypeError(f"unknown type {t!r} in Connect schema")


def schema_names(cs: dict, _path: str = "") -> dict[str, str]:
    """Extract named-type decorations from a parsed Connect schema:
    {dotted path: name} for every node carrying a user `name` — the
    decode half of the nested-named-type wire ride (the reference's
    LookupTypeNamed wrap, connectjson.go:269-271). Synthetic
    "zng.<digest>" record names (Connect requires one per struct) are
    not decorations and are skipped. Feed the result to
    Pool.load(type_names=) / Context(path_names=) so decorators survive
    the full consume→pool→query round-trip."""
    out: dict[str, str] = {}
    name = cs.get("name")
    if name and not name.startswith("zng."):
        out[_path] = name
    if cs.get("type") == "struct":
        for f in cs.get("fields") or []:
            child = f"{_path}.{f['field']}" if _path else f["field"]
            out.update(schema_names(f, child))
    return out


def encode(col: Column, dt: StructType, name: str | None = None,
           names: dict[str, str] | None = None) -> Column:
    """struct column → Connect-JSON text column ({"schema":...,"payload":...}).
    `names`: nested named-type decorations to ride the wire schema."""
    schema_text = json.dumps(connect_schema(dt, name, names=names),
                             separators=(",", ":"))
    return F.concat(
        F.lit('{"schema":' + schema_text + ',"payload":'),
        F.coalesce(F.to_json(col), F.lit("null")),
        F.lit("}"),
    )


def decode(col: Column, dt: StructType) -> Column:
    """Connect-JSON text column → typed struct (schema-on-read)."""
    payload = F.get_json_object(col, "$.payload")
    return F.from_json(payload, dt)


def encode_df(df: DataFrame, col: str, dt: StructType) -> DataFrame:
    return df.withColumn(col, encode(F.col(col), dt))


def decode_df(df: DataFrame, col: str, dt: StructType) -> DataFrame:
    return df.withColumn(col, decode(F.col(col), dt))
