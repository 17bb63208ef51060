"""Property-based ZSON round-trip (hypothesis): anything the writer can
render must parse back to the same values AND the same Spark types —
the round-4 ADVICE failure mode (writer emits forms the reader can't
parse) made into a standing fuzz gate. Pure Python (render/parse), no
Spark session: runs hundreds of shapes per second.

Excluded by design, per the reader docstring's documented subset:
decimals (render undecorated, read back as float64) and always-null
fields (their type is unknowable from text)."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from zync_spark import zson

# safe text: no surrogates (json), printable-ish plus unicode
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    min_size=0, max_size=12)

_prims = st.sampled_from([
    (LongType(), st.integers(-2**62, 2**62)),
    (IntegerType(), st.integers(-2**31, 2**31 - 1)),
    (ShortType(), st.integers(-2**15, 2**15 - 1)),
    (ByteType(), st.integers(-128, 127)),
    (DoubleType(), st.floats(allow_nan=False, allow_infinity=True,
                             width=64)),
    (FloatType(), st.floats(allow_nan=False, allow_infinity=False,
                            width=32)),
    (BooleanType(), st.booleans()),
    (StringType(), _text),
    (BinaryType(), st.binary(min_size=0, max_size=8)),
    (TimestampType(), st.datetimes(
        min_value=datetime.datetime(1900, 1, 1),
        max_value=datetime.datetime(2100, 1, 1))),
    (DateType(), st.dates(min_value=datetime.date(1900, 1, 1),
                          max_value=datetime.date(2100, 1, 1))),
])


@st.composite
def _field(draw):
    """(DataType, value) — primitive, array-of-primitive, or nested
    struct of primitives. Non-null by construction (an always-null
    field's type is unrecoverable from text, documented)."""
    kind = draw(st.integers(0, 3))
    if kind <= 1:
        t, vs = draw(_prims)
        return t, draw(vs)
    if kind == 2:
        t, vs = draw(_prims)
        vals = draw(st.lists(vs, min_size=1, max_size=4))
        return ArrayType(t), vals
    n = draw(st.integers(1, 3))
    fields, vals = [], {}
    for i in range(n):
        t, vs = draw(_prims)
        fields.append(StructField(f"n{i}", t))
        vals[f"n{i}"] = draw(vs)
    return StructType(fields), vals


class _RowView:
    """Minimal row adapter: render_row/render index by field name."""

    def __init__(self, d):
        self._d = d

    def __getitem__(self, k):
        return self._d[k]


def _conform(v, t):
    if isinstance(t, StructType):
        return tuple(_conform(v[f.name], f.dataType) for f in t.fields)
    if isinstance(t, ArrayType):
        return [_conform(x, t.elementType) for x in v]
    if isinstance(t, TimestampType) and v.microsecond == 0:
        return v
    return v


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, tuple):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@given(st.lists(_field(), min_size=1, max_size=4))
@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_render_parse_round_trip(fields):
    schema = StructType(
        [StructField(f"f{i}", t) for i, (t, _) in enumerate(fields)])
    row = _RowView({f"f{i}": v for i, (_, v) in enumerate(fields)})
    line = zson.render_row(row, schema)
    rows, got_schema, names = zson.parse(line)
    assert names == {}
    assert len(rows) == 1
    assert [f.name for f in got_schema.fields] == \
        [f.name for f in schema.fields]
    for want_f, got_f in zip(schema.fields, got_schema.fields):
        assert got_f.dataType == want_f.dataType, (
            f"{want_f.name}: {want_f.dataType} -> {got_f.dataType}\n{line}")
    want = tuple(_conform(v, t) for (t, v) in fields)
    assert _eq(rows[0], want), f"{want} -> {rows[0]}\n{line}"


@given(st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=6),
       st.sampled_from([ByteType(), ShortType(), IntegerType(), LongType()]))
@settings(max_examples=40, deadline=None)
def test_mixed_width_rows_fuse_to_widest(vals, narrow):
    """Rows carrying different int widths at one field fuse to the
    widest width present, never an error (zed fuse semantics)."""
    lines = ["{a:%d}" % v for v in vals] + ["{a:5%s}" % {
        ByteType: "(int8)", ShortType: "(int16)",
        IntegerType: "(int32)", LongType: "",
    }[type(narrow)]]
    rows, schema, _ = zson.parse("\n".join(lines))
    assert schema["a"].dataType == LongType()
    assert [r[0] for r in rows] == vals + [5]
