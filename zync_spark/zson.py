"""ZSON text writer: render envelope rows the way the reference's CLI
prints them (`zed query -z`, ztests/etl-demo.yaml:28-37) —
``{key:{ID:100},value:{...},kafka:{topic:"NewInvoices",offset:0}}`` data
records and ``{kafka:{...,offset:1}}(=done)`` decorated markers.

Model mapping (the inverse of the envelope substitution, SURVEY §1.2):

- Null STRUCT FIELDS are omitted: the unified pool schema null-pads
  every shape into one wide type, so a row's ZSON shape is its non-null
  projection — exactly the per-value record the reference stored.
  (Inside arrays/maps, null is a real value and renders as ``null``.)
- The ``zed_type`` discriminator becomes the TOP-LEVEL named-type
  decorator: ``(=done)`` for marker rows; ``data`` (and null) rows are
  plain records, so they carry none.
- NESTED decorators come from the path registry (Pool.type_names):
  a decorated path's rendered value gets its ``(=name)`` suffix.
- Implied ZSON types need no decorator (int64, float64, string, bool);
  narrower primitives carry theirs (``8(int8)``, ``32.5(float32)``) so
  the text parses back to the same type, matching the reference's
  writer (connectjson_test.go's case list is the shape of truth).

Driver-side, console path ONLY (the CLI collects these rows anyway);
the distributed sinks stay parquet/csv/json.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

_INT_DECOR = {ByteType: "(int8)", ShortType: "(int16)", IntegerType: "(int32)"}


def _render_float(v: float, suffix: str = "") -> str:
    if v != v or v in (float("inf"), float("-inf")):  # NaN/Inf forms
        s = "NaN" if v != v else ("+Inf" if v > 0 else "-Inf")
        return s + suffix
    if v == int(v) and abs(v) < 1e15:
        return f"{int(v)}.{suffix}"  # zson: 64. means 64.0
    return repr(v) + suffix


def render(v: Any, dtype: DataType, names: dict[str, str] | None = None,
           path: str = "") -> str:
    """One value → ZSON text. `names` decorates dotted paths ('' = this
    value's root)."""
    deco = (names or {}).get(path)
    suffix = f"(={deco})" if deco else ""
    if v is None:
        return "null" + suffix
    if isinstance(dtype, StructType):
        parts = []
        for f in dtype.fields:
            fv = v[f.name]
            if fv is None:
                continue  # null-padded field = absent from this shape
            child = f"{path}.{f.name}" if path else f.name
            parts.append(f"{f.name}:{render(fv, f.dataType, names, child)}")
        return "{" + ",".join(parts) + "}" + suffix
    if isinstance(dtype, ArrayType):
        return ("[" + ",".join(
            render(x, dtype.elementType, None, "") for x in v) + "]" + suffix)
    if isinstance(dtype, MapType):
        items = sorted(v.items()) if isinstance(v, dict) else v.items()
        return ("|{" + ",".join(
            f"{render(k, dtype.keyType, None, '')}:"
            f"{render(x, dtype.valueType, None, '')}"
            for k, x in items) + "}|" + suffix)
    if isinstance(dtype, StringType):
        return json.dumps(v) + suffix
    if isinstance(dtype, BooleanType):
        return ("true" if v else "false") + suffix
    if isinstance(dtype, LongType):
        return str(int(v)) + suffix
    for t, d in _INT_DECOR.items():
        if isinstance(dtype, t):
            return f"{int(v)}{d}" + suffix
    if isinstance(dtype, DoubleType):
        return _render_float(float(v)) + suffix
    if isinstance(dtype, FloatType):
        return _render_float(float(v), "(float32)") + suffix
    if isinstance(dtype, DecimalType):
        return str(v) + suffix
    if isinstance(dtype, BinaryType):
        return "0x" + bytes(v).hex() + suffix
    if isinstance(dtype, TimestampType):
        return v.isoformat().replace("+00:00", "") + "Z" + suffix
    if isinstance(dtype, DateType):
        return v.isoformat() + suffix
    return json.dumps(str(v)) + suffix  # conservative fallback


def render_row(row, schema: StructType,
               names: dict[str, str] | None = None) -> str:
    """One envelope row → one ZSON line. zed_type drives the top-level
    decorator and is dropped from the record body; null top-level fields
    are absent (the row's per-value shape)."""
    ztype = None
    parts = []
    for f in schema.fields:
        fv = row[f.name]
        if f.name == "zed_type":
            ztype = fv
            continue
        if fv is None:
            continue
        parts.append(f"{f.name}:{render(fv, f.dataType, names, f.name)}")
    deco = f"(={ztype})" if ztype and ztype != "data" else ""
    return "{" + ",".join(parts) + "}" + deco
