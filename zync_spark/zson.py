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
        # raw UTF-8 like the reference's writer (the reader also accepts
        # \uXXXX escapes, so either form round-trips)
        return json.dumps(v, ensure_ascii=False) + suffix
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


# -- reader ----------------------------------------------------------------
# Parses the ZSON subset the reference's demo/ztest files use
# (demo/batch-*.zson, staging-1.zson): records/arrays/maps, strings,
# int64/float64 literals (incl. NaN/+Inf/-Inf), ISO time/date literals,
# narrower-primitive decorators, named-type decorators, // comments,
# trailing commas, multi-line values. The
# result is Spark-ready: values + a UNIFIED null-padded schema (the
# envelope substitution applied at read time) + the path decorations for
# the pool registry.


class ZsonParseError(ValueError):
    pass


_TIME_RE = None  # compiled lazily below


def _time_match(text: str, i: int):
    """ISO date/time literal at position i (the writer's own output
    forms: 2024-01-02 and 2024-01-02T03:04:05[.ffffff][Z|±HH:MM])."""
    global _TIME_RE
    if _TIME_RE is None:
        import re

        _TIME_RE = re.compile(
            r"\d{4}-\d{2}-\d{2}"
            r"(T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?)?")
    return _TIME_RE.match(text, i)


def _tokenize(text: str):
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if text.startswith("//", i):
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if text.startswith("+Inf", i) or text.startswith("-Inf", i):
            yield ("num", text[i:i + 4], i)
            i += 4
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and text[j] != '"':
                if text[j] == "\\":
                    esc = text[j + 1] if j + 1 < n else ""
                    if esc == "u":
                        # \uXXXX — json.dumps-style escapes round-trip
                        hexs = text[j + 2:j + 6]
                        if len(hexs) != 4:
                            raise ZsonParseError(
                                f"bad \\u escape at {j}")
                        try:
                            buf.append(chr(int(hexs, 16)))
                        except ValueError:
                            raise ZsonParseError(
                                f"bad \\u escape at {j}") from None
                        j += 6
                        continue
                    buf.append(
                        {"n": "\n", "t": "\t", "r": "\r", '"': '"',
                         "\\": "\\", "/": "/", "b": "\b", "f": "\f"}
                        .get(esc, esc))
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ZsonParseError(f"unterminated string at {i}")
            yield ("str", "".join(buf), i)
            i = j + 1
            continue
        if c in "{}[]():,|=":
            yield ("op", c, i)
            i += 1
            continue
        if c == "-" or c.isdigit():
            j = i + 1
            if text.startswith("0x", i):
                j = i + 2
                while j < n and text[j] in "0123456789abcdefABCDEF":
                    j += 1
                if (j - i - 2) % 2:
                    raise ZsonParseError(
                        f"odd-length hex bytes literal at {i}")
                yield ("bytes", text[i + 2:j], i)
                i = j
                continue
            m = _time_match(text, i) if c.isdigit() else None
            if m and m.end() - i > 8:  # a date at minimum (yyyy-mm-dd)
                yield ("time", m.group(0), i)
                i = m.end()
                continue
            while j < n and (text[j].isdigit() or text[j] in ".eE+-"):
                # '+'/'-' only valid right after an exponent marker
                if text[j] in "+-" and text[j - 1] not in "eE":
                    break
                j += 1
            yield ("num", text[i:j], i)
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            yield ("ident", text[i:j], i)
            i = j
            continue
        raise ZsonParseError(f"unexpected character {c!r} at {i}")
    yield ("eof", "", n)


_PRIM_DECOR = {
    "int8": ByteType(), "int16": ShortType(), "int32": IntegerType(),
    "uint8": ShortType(), "uint16": IntegerType(), "uint32": LongType(),
    "int64": LongType(), "uint64": LongType(),
    "float32": FloatType(), "float64": DoubleType(),
}

# type-literal names (the SURVEY §1.3 bridge subset) — used by TYPED
# NULLS: null(string), null({id:int32,...}), null(named={...})
_TYPE_NAMES = {
    **_PRIM_DECOR,
    "string": StringType(), "bool": BooleanType(), "bytes": BinaryType(),
    "time": TimestampType(), "duration": LongType(),
    "float16": FloatType(),
}


class _Reader:
    def __init__(self, text: str):
        self.toks = list(_tokenize(text))
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, text=None):
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise ZsonParseError(f"expected {text or kind}, got {t[1]!r} at {t[2]}")
        return t

    def parse_value(self, path: str, names: dict):
        """→ (python value, DataType). Decorations land in `names`."""
        t = self.peek()
        if t[0] == "op" and t[1] == "{":
            v, dt = self._parse_record(path, names)
        elif t[0] == "op" and t[1] == "[":
            v, dt = self._parse_array(path, names)
        elif t[0] == "op" and t[1] == "|":
            v, dt = self._parse_map(path, names)
        elif t[0] == "str":
            self.next()
            v, dt = t[1], StringType()
        elif t[0] == "bytes":
            self.next()
            v, dt = bytes.fromhex(t[1]), BinaryType()
        elif t[0] == "time":
            self.next()
            v, dt = _parse_time(t[1], t[2])
        elif t[0] == "num":
            self.next()
            if t[1] in ("+Inf", "-Inf"):
                v, dt = float(t[1][0] + "inf"), DoubleType()
            elif any(ch in t[1] for ch in ".eE"):
                v, dt = float(t[1]), DoubleType()
            else:
                v, dt = int(t[1]), LongType()
        elif t[0] == "ident" and t[1] == "NaN":
            self.next()
            v, dt = float("nan"), DoubleType()
        elif t[0] == "ident" and t[1] in ("true", "false"):
            self.next()
            v, dt = t[1] == "true", BooleanType()
        elif t[0] == "ident" and t[1] == "null":
            self.next()
            v, dt = None, None  # type comes from a decorator or a sibling
        else:
            raise ZsonParseError(f"unexpected {t[1]!r} at {t[2]}")
        return self._decorations(v, dt, path, names)

    def _parse_type(self):
        """A zed TYPE literal (inside a typed-null decoration) → the
        reader's internal type representation: primitives as Spark
        types, records/arrays as the same tuples the value parser
        infers, so typed nulls merge with sibling values' shapes."""
        t = self.next()
        if t[0] == "op" and t[1] == "{":
            fields = []
            while not (self.peek()[0] == "op" and self.peek()[1] == "}"):
                nt = self.next()
                if nt[0] not in ("ident", "str"):
                    raise ZsonParseError(f"expected field name at {nt[2]}")
                self.expect("op", ":")
                fields.append((nt[1], self._parse_type()))
                if self.peek()[0] == "op" and self.peek()[1] == ",":
                    self.next()
            self.next()  # }
            return ("struct", fields)
        if t[0] == "op" and t[1] == "[":
            elem = self._parse_type()
            self.expect("op", "]")
            return ("array", elem)
        if t[0] == "ident" and t[1] in _TYPE_NAMES:
            return _TYPE_NAMES[t[1]]
        raise ZsonParseError(f"unsupported type literal {t[1]!r} at {t[2]}")

    def _decorations(self, v, dt, path, names):
        while self.peek()[0] == "op" and self.peek()[1] == "(":
            self.next()
            t = self.peek()
            if t[0] == "op" and t[1] in "{[":
                # typed null: null({id:int32,...}) / null([int64])
                if v is not None:
                    raise ZsonParseError(
                        f"composite type decoration on a non-null value "
                        f"at {t[2]}")
                dt = self._parse_type()
                self.expect("op", ")")
                continue
            t = self.next()
            if t[0] == "op" and t[1] == "=":
                names[path] = self.expect("ident")[1]
            elif (t[0] == "ident"
                  and self.peek()[0] == "op" and self.peek()[1] == "="):
                # named typed null: null(named={...}) — the decode-side
                # twin of connectjson's LookupTypeNamed wrap
                names[path] = t[1]
                self.next()  # =
                dt = self._parse_type()
            elif t[0] == "ident" and v is None and t[1] in _TYPE_NAMES:
                dt = _TYPE_NAMES[t[1]]  # typed null: null(string)
            elif t[0] == "ident" and t[1] in _PRIM_DECOR:
                dt = _PRIM_DECOR[t[1]]
                if v is not None and isinstance(dt, (FloatType,)):
                    v = float(v)
                elif v is not None and not isinstance(dt, DoubleType):
                    v = int(v)
            else:
                raise ZsonParseError(
                    f"unsupported decoration {t[1]!r} at {t[2]} (the reader "
                    "covers named and primitive decorators)")
            self.expect("op", ")")
        return v, dt

    def _parse_record(self, path, names):
        self.expect("op", "{")
        vals: dict = {}
        fields: list = []
        while not (self.peek()[0] == "op" and self.peek()[1] == "}"):
            nt = self.next()
            if nt[0] not in ("ident", "str"):
                raise ZsonParseError(f"expected field name at {nt[2]}")
            self.expect("op", ":")
            child = f"{path}.{nt[1]}" if path else nt[1]
            v, dt = self.parse_value(child, names)
            vals[nt[1]] = v
            fields.append((nt[1], dt))
            if self.peek()[0] == "op" and self.peek()[1] == ",":
                self.next()  # separator (trailing comma tolerated)
        self.next()  # }
        return vals, ("struct", fields)

    def _parse_array(self, path, names):
        self.expect("op", "[")
        out = []
        elem_t = None
        while not (self.peek()[0] == "op" and self.peek()[1] == "]"):
            v, dt = self.parse_value(path, names)
            out.append(v)
            elem_t = _merge_types(elem_t, dt, path)
            if self.peek()[0] == "op" and self.peek()[1] == ",":
                self.next()
        self.next()
        return out, ("array", elem_t)

    def _parse_map(self, path, names):
        self.expect("op", "|")
        self.expect("op", "{")
        out = {}
        kt = vt = None
        while not (self.peek()[0] == "op" and self.peek()[1] == "}"):
            k, kdt = self.parse_value(path, names)
            self.expect("op", ":")
            v, vdt = self.parse_value(path, names)
            out[k] = v
            kt = _merge_types(kt, kdt, path)
            vt = _merge_types(vt, vdt, path)
            if self.peek()[0] == "op" and self.peek()[1] == ",":
                self.next()
        self.next()
        self.expect("op", "|")
        return out, ("map", kt, vt)


def _parse_time(s: str, pos: int):
    """ISO date/time literal → (value, type). Timestamps normalize to
    naive UTC (the writer emits UTC with a Z suffix and Spark stores
    session-local naive datetimes — keep sessions on UTC for byte-exact
    round-trips, the repo default)."""
    import datetime

    try:
        if "T" not in s:
            return datetime.date.fromisoformat(s), DateType()
        v = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v, TimestampType()
    except ValueError:
        raise ZsonParseError(f"bad time literal {s!r} at {pos}") from None


# numeric widening lattice (zed fuse semantics): among ints the wider
# width wins; an int meeting a float widens to float64 (never the
# reverse — a double column must not narrow because one value was int)
_INT_RANK = [ByteType, ShortType, IntegerType, LongType]


def _merge_types(a, b, path):
    """Unify two inferred types (fuse semantics: struct fields union in
    first-seen order, null defers, equal primitives agree; mixed int
    widths widen to the wider int; int + float widens to double)."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0]:
        if a[0] == "struct":
            order = [n for n, _ in a[1]]
            amap = dict(a[1])
            bmap = dict(b[1])
            for n, _ in b[1]:
                if n not in amap:
                    order.append(n)
            return ("struct", [
                (n, _merge_types(amap.get(n), bmap.get(n), f"{path}.{n}"))
                for n in order
            ])
        if a[0] == "array":
            return ("array", _merge_types(a[1], b[1], path))
        return ("map", _merge_types(a[1], b[1], path),
                _merge_types(a[2], b[2], path))
    if a == b:
        return a
    if not (isinstance(a, tuple) or isinstance(b, tuple)):
        kinds = {type(a), type(b)}
        ints = [k for k in kinds if k in _INT_RANK]
        floats = kinds - set(ints)
        if len(ints) == 2:  # {a:5(int32)} then {a:9} → int64, not an error
            return max(ints, key=_INT_RANK.index)()
        if ints and floats <= {FloatType, DoubleType}:
            return DoubleType()
        if kinds == {FloatType, DoubleType}:
            return DoubleType()
    raise ZsonParseError(f"conflicting types at {path or '<root>'}: {a} vs {b}")


def _to_spark_type(t) -> DataType:
    if t is None:
        # an always-null field: string is the least-surprising carrier
        return StringType()
    if isinstance(t, tuple):
        if t[0] == "struct":
            from pyspark.sql.types import StructField

            return StructType(
                [StructField(n, _to_spark_type(ft)) for n, ft in t[1]])
        if t[0] == "array":
            return ArrayType(_to_spark_type(t[1]))
        return MapType(_to_spark_type(t[1]), _to_spark_type(t[2]))
    return t


def _conform_value(v, t):
    """Inferred value dict → tuple matching the unified schema (absent
    fields null-padded; ints coerced to float where the long/double
    merge widened the field — PySpark's row verifier rejects int for
    DoubleType)."""
    if v is None:
        return None
    if isinstance(t, tuple):
        if t[0] == "struct":
            return tuple(_conform_value(v.get(n), ft) for n, ft in t[1])
        if t[0] == "array":
            return [_conform_value(x, t[1]) for x in v]
        return {k: _conform_value(x, t[2]) for k, x in v.items()}
    if isinstance(t, (DoubleType, FloatType)) and isinstance(v, int):
        return float(v)
    return v


def parse(text: str):
    """ZSON text → (rows, spark schema, path decorations).

    Top-level values must be records (the envelope/demo form). Their
    shapes FUSE into one unified null-padded schema — the same
    substitution the pool layer applies — and a top-level named
    decorator becomes a ``zed_type`` column (absent when no value is
    decorated). Decorations on nested paths are returned for
    Pool.load(type_names=)."""
    r = _Reader(text)
    raws: list = []
    unified = None
    names: dict[str, str] = {}
    ztypes: list = []
    while r.peek()[0] != "eof":
        per: dict[str, str] = {}
        v, dt = r.parse_value("", per)
        if not (isinstance(dt, tuple) and dt[0] == "struct"):
            raise ZsonParseError("top-level zson values must be records")
        ztypes.append(per.pop("", None))
        names.update(per)
        raws.append(v)
        unified = _merge_types(unified, dt, "")
    if unified is None:
        return [], StructType([]), {}
    rows = [_conform_value(v, unified) for v in raws]
    schema = _to_spark_type(unified)
    if any(z is not None for z in ztypes):
        from pyspark.sql.types import StructField

        schema = StructType(
            list(schema.fields) + [StructField("zed_type", StringType())])
        rows = [row + (z if z is not None else "data",)
                for row, z in zip(rows, ztypes)]
    return rows, schema, names


def read(spark, path_or_text: str, max_bytes: int | None = 64 << 20):
    """Load a .zson file (or literal text) into a DataFrame + its path
    decorations: (df, type_names). The reference's own demo inputs
    (demo/batch-*.zson) load verbatim.

    Round-trip coverage (writer → reader): records/arrays/maps, strings
    (incl. escapes), all int widths, float64 incl. NaN/±Inf, float32,
    bool, bytes, time/date literals, typed nulls, named decorators.
    Decimals render UNdecorated and read back as float64 (documented
    lossy corner — zed's decimal type has no Spark-exact twin).

    This is the console/demo path: the whole text parses ON THE DRIVER
    (ZSON values span lines, so a distributed line-split would tear
    them). `max_bytes` (default 64 MB) refuses larger files with a
    clear error instead of silently serializing a big ingest through
    one process — bulk data belongs in parquet/pools (`produce
    --format json/avro`, Pool.load). Pass max_bytes=None to override
    knowingly."""
    import os

    text = path_or_text
    if os.path.exists(path_or_text):
        if max_bytes is not None and os.path.getsize(path_or_text) > max_bytes:
            raise ZsonParseError(
                f"{path_or_text} is {os.path.getsize(path_or_text)} bytes; "
                f"zson.read parses on the driver and refuses files over "
                f"{max_bytes} bytes. Use zson.read_lines for a distributed "
                "load of line-delimited ZSON, convert bulk data to "
                "parquet/json, or pass max_bytes=None to force.")
        with open(path_or_text) as f:
            text = f.read()
    rows, schema, names = parse(text)
    return spark.createDataFrame(rows, schema), names


def _parse_line(line: str):
    """One line → (value, dtype, decorations) or None for blank/comment
    lines. Exactly ONE top-level record per line — the line-delimited
    contract `render_row` emits and `zed query -z` prints."""
    r = _Reader(line)
    if r.peek()[0] == "eof":
        return None
    per: dict[str, str] = {}
    v, dt = r.parse_value("", per)
    if not (isinstance(dt, tuple) and dt[0] == "struct"):
        raise ZsonParseError("top-level zson values must be records")
    if r.peek()[0] != "eof":
        raise ZsonParseError(
            "more than one value on a line — not line-delimited ZSON")
    return v, dt, per


def _freeze_type(t):
    """Inferred-type rep → hashable twin (struct field lists become
    tuples) so shapes can ride a distinct()."""
    if isinstance(t, tuple):
        if t[0] == "struct":
            return ("struct", tuple((n, _freeze_type(x)) for n, x in t[1]))
        if t[0] == "array":
            return ("array", _freeze_type(t[1]))
        if t[0] == "map":
            return ("map", _freeze_type(t[1]), _freeze_type(t[2]))
    return t


def _thaw_type(t):
    if isinstance(t, tuple):
        if t[0] == "struct":
            return ("struct", [(n, _thaw_type(x)) for n, x in t[1]])
        if t[0] == "array":
            return ("array", _thaw_type(t[1]))
        if t[0] == "map":
            return ("map", _thaw_type(t[1]), _thaw_type(t[2]))
    return t


def read_lines(spark, path: str):
    """Distributed reader for LINE-DELIMITED ZSON (one record per line —
    the form `render_row`/`consume --format zson` write and `zed query
    -z` prints): (df, type_names), same contract as `read` without the
    driver bottleneck — this is the bulk-ingest path the 64 MB guard in
    `read` points at.

    Two distributed passes over `spark.read.text`:

    1. SHAPE pass — every line parses on the executors, but only the
       per-partition-DISTINCT (dtype, decorations) shapes travel to the
       driver, where they fuse through the same `_merge_types` substi-
       tution the driver path uses. Shape count is bounded by type
       variety, not row count.
    2. PARSE pass — lines parse again and conform to the fused schema
       (two parses buys not shipping raw Python values through a
       shuffle; parsing is the cheap part next to Python serialization).

    Pretty-printed ZSON (values spanning lines) fails with a clear
    per-line error naming this contract — use `read` for those files.
    Python-rate parsing: fine for ingest (it distributes); columnar
    formats remain the right home for hot data.
    """
    lines = spark.read.text(path)

    def _shapes(pidx, it):
        seen = {}
        for pos, row in enumerate(it):
            parsed = _parse_line(row.value)
            if parsed is None:
                continue
            _, dt, per = parsed
            key = (_freeze_type(dt), tuple(sorted(per.items())))
            if key not in seen:
                seen[key] = (pidx, pos)
        return iter(seen.items())

    unified = None
    names: dict[str, str] = {}
    any_ztype = False
    # Fold shapes in FIRST-APPEARANCE file order, not collect() order:
    # .distinct().collect() order is nondeterministic and _merge_types
    # unions struct fields first-seen, so an unsorted fold could yield
    # run-dependent column order for heterogeneous files (round-6
    # review). Each partition reports its shapes tagged with (partition
    # index, line offset); the driver keeps the minimum tag per shape
    # and folds in that order — deterministic (text partitions follow
    # file offsets) and identical to the driver `read` path's order.
    first_seen: dict = {}
    for key, tag in lines.rdd.mapPartitionsWithIndex(_shapes).collect():
        if key not in first_seen or tag < first_seen[key]:
            first_seen[key] = tag
    shapes = sorted(first_seen, key=first_seen.__getitem__)
    for dt, per_items in shapes:
        per = dict(per_items)
        if per.pop("", None) is not None:
            any_ztype = True
        names.update(per)
        unified = _merge_types(unified, _thaw_type(dt), "")
    if unified is None:
        return spark.createDataFrame([], StructType([])), {}

    schema = _to_spark_type(unified)
    if any_ztype:
        from pyspark.sql.types import StructField

        schema = StructType(
            list(schema.fields) + [StructField("zed_type", StringType())])

    def _rows(it):
        for row in it:
            parsed = _parse_line(row.value)
            if parsed is None:
                continue
            v, _, per = parsed
            out = _conform_value(v, unified)
            if any_ztype:
                out = out + (per.get("") or "data",)
            yield out

    return spark.createDataFrame(lines.rdd.mapPartitions(_rows), schema), names
