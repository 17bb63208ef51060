"""Pure-Python Avro binary codec + Confluent wire framing.

The container has neither the spark-avro datasource jar nor a Python avro
package, so the bridge carries its own minimal binary codec for the schema
subset the synthesizer emits (records of nullable primitives / nested
records / arrays). It runs inside Arrow-batched mapInPandas stages — a
per-record transcode exactly like the reference's row-at-a-time encoder
(fifo/producer.go:48-71), but batched per Arrow chunk.

Wire format (Confluent framing, zavro/encoder.go:59-66, decoder.go:35-52):
1 magic byte 0x00 + 4-byte big-endian schema id + Avro binary body.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

# ---------------------------------------------------------------------------
# varint / zigzag primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc), pos
        shift += 7


# ---------------------------------------------------------------------------
# schema-driven encode/decode (python value ↔ bytes)
# ---------------------------------------------------------------------------


def encode_value(buf: bytearray, schema, value) -> None:
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) > 1:
            # General union: `value` is the tagged-struct mapping
            # (tag = raw union selector, b<i>_<label> = branch value) —
            # see avro_schema.from_avro_schema / union_branch_label.
            from zync_spark.sources.avro_schema import union_branch_label

            if value is None:
                write_long(buf, schema.index("null"))
                return
            branch = int(value["tag"])
            if not 0 <= branch < len(schema):
                raise ValueError(f"union tag {branch} out of range 0..{len(schema)-1}")
            write_long(buf, branch)
            sub = schema[branch]
            if sub != "null":
                encode_value(
                    buf, sub, value.get(f"b{branch}_{union_branch_label(sub)}")
                )
            return
        if value is None:
            write_long(buf, schema.index("null"))
            return
        branch = next(i for i, s in enumerate(schema) if s != "null")
        write_long(buf, branch)
        encode_value(buf, schema[branch], value)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema.get("fields") or []:
                encode_value(buf, f["type"], None if value is None else value.get(f["name"]))
            return
        if t == "array":
            items = list(value or [])
            if items:
                write_long(buf, len(items))
                for it in items:
                    encode_value(buf, schema["items"], it)
            write_long(buf, 0)
            return
        if t == "long":  # incl. timestamp-micros logical type
            if isinstance(value, datetime):
                value = int(value.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
            write_long(buf, int(value))
            return
        schema = t  # unwrap {"type": "string"} style
    if schema == "null":
        return
    if schema == "boolean":
        buf.append(1 if value else 0)
    elif schema in ("int", "long"):
        write_long(buf, int(value))
    elif schema == "float":
        buf.extend(struct.pack("<f", float(value)))
    elif schema == "double":
        buf.extend(struct.pack("<d", float(value)))
    elif schema == "bytes":
        b = bytes(value)
        write_long(buf, len(b))
        buf.extend(b)
    elif schema == "string":
        b = str(value).encode("utf-8")
        write_long(buf, len(b))
        buf.extend(b)
    else:
        raise TypeError(f"cannot encode schema {schema!r}")


def decode_value(data: bytes, pos: int, schema):
    if isinstance(schema, list):
        branch, pos = read_long(data, pos)
        if not 0 <= branch < len(schema):
            raise ValueError(
                f"bad union selector {branch} (union has {len(schema)} branches)"
            )
        non_null = [s for s in schema if s != "null"]
        if len(non_null) > 1:
            # General union → tagged struct, mirroring the reference's
            # tagged container (zavro/decoder.go:140-161): the raw selector
            # plus one nullable field per non-null branch.
            from zync_spark.sources.avro_schema import union_branch_label

            out = {"tag": branch}
            for i, s in enumerate(schema):
                if s != "null":
                    out[f"b{i}_{union_branch_label(s)}"] = None
            sub = schema[branch]
            if sub != "null":
                v, pos = decode_value(data, pos, sub)
                out[f"b{branch}_{union_branch_label(sub)}"] = v
            return out, pos
        return decode_value(data, pos, schema[branch])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            out = {}
            for f in schema.get("fields") or []:
                out[f["name"]], pos = decode_value(data, pos, f["type"])
            return out, pos
        if t == "array":
            items = []
            while True:
                n, pos = read_long(data, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte size prefix
                    _, pos = read_long(data, pos)
                    n = -n
                for _ in range(n):
                    v, pos = decode_value(data, pos, schema["items"])
                    items.append(v)
            return items, pos
        if t == "long" and schema.get("logicalType") == "timestamp-micros":
            v, pos = read_long(data, pos)
            return datetime.fromtimestamp(v / 1_000_000, tz=timezone.utc).replace(tzinfo=None), pos
        schema = t
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return data[pos] == 1, pos + 1
    if schema in ("int", "long"):
        return read_long(data, pos)
    if schema == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema == "bytes":
        n, pos = read_long(data, pos)
        return bytes(data[pos:pos + n]), pos + n
    if schema == "string":
        n, pos = read_long(data, pos)
        return data[pos:pos + n].decode("utf-8"), pos + n
    raise TypeError(f"cannot decode schema {schema!r}")


# ---------------------------------------------------------------------------
# Confluent wire framing
# ---------------------------------------------------------------------------


def frame(schema_id: int, body: bytes) -> bytes:
    """magic 0x00 + 4-byte BE schema id + avro body (zavro/encoder.go:59-66)."""
    return b"\x00" + struct.pack(">I", schema_id) + body


def unframe(data: bytes) -> tuple[int, bytes]:
    """→ (schema_id, body); validates the magic byte (zavro/decoder.go:35-52)."""
    if len(data) < 5 or data[0] != 0:
        raise ValueError(f"bad kafka-avro framing: {data[:5]!r}")
    return struct.unpack(">I", data[1:5])[0], data[5:]


def encode_record(schema: dict, value: dict | None, schema_id: int) -> bytes:
    buf = bytearray()
    encode_value(buf, schema, value)
    return frame(schema_id, bytes(buf))


def decode_record(schema: dict, data: bytes) -> dict | None:
    _, body = unframe(data)
    value, pos = decode_value(body, 0, schema)
    if pos != len(body):
        raise ValueError(f"trailing garbage after avro body: {len(body)-pos} bytes")
    return value
