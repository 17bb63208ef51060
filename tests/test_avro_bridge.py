"""Avro bridge tests mirroring the reference's golden tests
(zavro/schema_test.go) and wire-format round-trips."""

import json

import pytest

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from zync_spark.sources import avro_codec
from zync_spark.sources.avro_schema import (
    from_avro_schema,
    record_name,
    schema_json,
    to_avro_schema,
    zed_type_string,
)
from zync_spark.sources.registry import MemoryRegistry

S = StructType
Fld = StructField


def test_record_names_match_reference_md5s():
    """The golden names from zavro/schema_test.go:13-117 — our zed-syntax
    formatter must hash to the identical digests."""
    empty = S([])
    assert record_name(empty) == "zng_99914b932bd37a50b983c5e7c90ae93b"  # {}
    b = S([Fld("b", empty)])
    a = S([Fld("a", b)])
    assert zed_type_string(a) == "{a:{b:{}}}"
    assert record_name(a) == "zng_228c5f7a92fa77715f4dabe46739bfa3"
    assert record_name(b) == "zng_eeb636be88d6a4d3387b3820995db8e7"
    assert record_name(S([Fld("a", NullType())])) == "zng_4f5c13d8a692b16d2a7d297f951880a3"
    assert record_name(S([Fld("a", empty), Fld("b", empty)])) == "zng_2d7e63a29282715120ae93531a98c9ef"


def test_schema_json_golden_nested():
    """Exact JSON (incl. key order) for {a:{b:{}}} — schema_test.go:13-57."""
    empty = S([])
    schema = S([Fld("a", S([Fld("b", empty)]))])
    got = json.loads(schema_json(schema, "namespace"))
    assert list(got.keys()) == ["type", "name", "namespace", "doc", "fields"]
    assert got["name"] == "zng_228c5f7a92fa77715f4dabe46739bfa3"
    assert got["doc"] == "Created by zync from zng type {a:{b:{}}}"
    f = got["fields"][0]
    assert list(f.keys()) == ["name", "type", "default"]
    assert f["type"][0] == "null"
    inner = f["type"][1]
    assert inner["name"] == "zng_eeb636be88d6a4d3387b3820995db8e7"
    assert inner["fields"][0]["type"][1]["fields"] is None  # empty record → null fields


def test_null_field_not_union_wrapped():
    """{a:null} → plain "null", not ["null","null"] (schema_test.go:59-79)."""
    got = to_avro_schema(S([Fld("a", NullType())]))
    assert got["fields"][0]["type"] == "null"


def test_repeated_record_by_name_reference():
    """{a:{},b:{}} → second occurrence is a name string (schema_test.go:81-117)."""
    got = to_avro_schema(S([Fld("a", S([])), Fld("b", S([]))]))
    assert isinstance(got["fields"][0]["type"][1], dict)
    assert got["fields"][1]["type"][1] == "zng_99914b932bd37a50b983c5e7c90ae93b"


def test_timestamp_is_micros_logical():
    got = to_avro_schema(S([Fld("ts", TimestampType())]))
    assert got["fields"][0]["type"][1] == {"type": "long", "logicalType": "timestamp-micros"}


@pytest.mark.parametrize(
    "value",
    [
        {"i": 42, "s": "héllo", "d": 2.5, "b": b"\x01\x02", "ok": True, "arr": [1, 2, 3]},
        {"i": -1, "s": "", "d": -0.0, "b": b"", "ok": False, "arr": []},
        {"i": None, "s": None, "d": None, "b": None, "ok": None, "arr": None},
        None,
    ],
)
def test_codec_roundtrip(value):
    from pyspark.sql.types import BinaryType, BooleanType

    schema_t = S(
        [
            Fld("i", LongType()),
            Fld("s", StringType()),
            Fld("d", DoubleType()),
            Fld("b", BinaryType()),
            Fld("ok", BooleanType()),
            Fld("arr", ArrayType(LongType())),
        ]
    )
    avro = to_avro_schema(schema_t)
    wire = avro_codec.encode_record(avro, value, schema_id=7)
    assert wire[0] == 0 and wire[1:5] == (7).to_bytes(4, "big")
    back = avro_codec.decode_record(avro, wire)
    if value is None:
        # a null record decodes as all-null fields (fields are nullable unions)
        assert back == {k: None for k in ["i", "s", "d", "b", "ok", "arr"]} or back is None
    else:
        assert {k: (list(v) if isinstance(v, list) else v) for k, v in back.items()} == value


def test_non_null_union_maps_to_tagged_struct():
    """Multi-branch unions (reference: Zed union, zavro/schema.go:233-244)
    map to a struct of nullable branches + raw-selector tag column."""
    schema = {
        "type": "record",
        "name": "top",
        "fields": [
            {"name": "u", "type": ["null", "long", "string"], "default": None},
            {"name": "plain", "type": ["null", "long"], "default": None},
        ],
    }
    t = from_avro_schema(schema)
    assert t == S(
        [
            Fld("u", S([Fld("tag", LongType()), Fld("b1_long", LongType()),
                        Fld("b2_string", StringType())])),
            Fld("plain", LongType()),  # null-union still collapses
        ]
    )


@pytest.mark.parametrize(
    "u",
    [
        {"tag": 1, "b1_long": 7, "b2_string": None},
        {"tag": 2, "b1_long": None, "b2_string": "héllo"},
        {"tag": 0, "b1_long": None, "b2_string": None},  # explicit null branch
    ],
)
def test_non_null_union_codec_roundtrip(u):
    """3-branch union round-trip in the reference's tagged-container
    semantics (zavro/decoder.go:140-161): the selector survives decode,
    null-branch values keep their tag rather than collapsing to null."""
    schema = {
        "type": "record",
        "name": "top",
        "fields": [{"name": "u", "type": ["null", "long", "string"], "default": None}],
    }
    wire = avro_codec.encode_record(schema, {"u": u}, schema_id=3)
    back = avro_codec.decode_record(schema, wire)
    assert back == {"u": u}


def test_non_null_union_record_branch():
    """A union carrying a named record branch: field name uses the record
    name; nested null-union fields inside the branch still collapse."""
    inner = {
        "type": "record",
        "name": "addr",
        "fields": [{"name": "city", "type": ["null", "string"], "default": None}],
    }
    schema = {
        "type": "record",
        "name": "top",
        "fields": [{"name": "u", "type": ["null", "string", inner], "default": None}],
    }
    t = from_avro_schema(schema)
    assert t["u"].dataType == S(
        [Fld("tag", LongType()), Fld("b1_string", StringType()),
         Fld("b2_addr", S([Fld("city", StringType())]))]
    )
    val = {"u": {"tag": 2, "b1_string": None, "b2_addr": {"city": "Oslo"}}}
    wire = avro_codec.encode_record(schema, val, schema_id=9)
    assert avro_codec.decode_record(schema, wire) == val
    # encoding plain None writes the null selector; decode keeps the tag
    wire2 = avro_codec.encode_record(schema, {"u": None}, schema_id=9)
    assert avro_codec.decode_record(schema, wire2) == {
        "u": {"tag": 0, "b1_string": None, "b2_addr": None}
    }


def test_zigzag_edges():
    for n in [0, -1, 1, 63, -64, 2**62, -(2**62), 2**63 - 1, -(2**63)]:
        buf = bytearray()
        avro_codec.write_long(buf, n)
        got, pos = avro_codec.read_long(bytes(buf), 0)
        assert got == n and pos == len(buf)


def test_from_avro_schema_roundtrip():
    t = S([Fld("a", LongType()), Fld("nested", S([Fld("x", StringType())])),
           Fld("ts", TimestampType()), Fld("arr", ArrayType(DoubleType()))])
    back = from_avro_schema(to_avro_schema(t))
    assert back == t


def test_registry_dedup_and_subjects():
    reg = MemoryRegistry()
    t1 = S([Fld("a", LongType())])
    t2 = S([Fld("a", LongType())])
    sid1 = reg.register(record_name(t1), schema_json(t1))
    sid2 = reg.register(record_name(t2), schema_json(t2))
    assert sid1 == sid2                      # identical structure → same id
    t3 = S([Fld("b", LongType())])
    assert reg.register(record_name(t3), schema_json(t3)) != sid1
    assert reg.subjects() == sorted({record_name(t1), record_name(t3)})
    assert reg.lookup(sid1)["name"] == record_name(t1)


def test_dataframe_encode_decode_roundtrip(spark):
    """Envelope value column → wire bytes → back, through mapInPandas."""
    from zync_spark.sources.avro import decode_column, encode_column

    schema_t = S([Fld("ID", LongType()), Fld("name", StringType())])
    df = spark.createDataFrame(
        [(1, (100, "Alice")), (2, (101, None)), (3, None)],
        S([Fld("k", LongType()), Fld("value", schema_t)]),
    )
    reg = MemoryRegistry()
    wire = encode_column(df, "value", schema_t, reg)
    rows = {r["k"]: r["value"] for r in wire.collect()}
    assert rows[1][0] == 0 and rows[1][1:5] == (1).to_bytes(4, "big")
    back = decode_column(wire, "value", schema_t, reg)
    got = {r["k"]: r["value"] for r in back.collect()}
    assert got[1]["ID"] == 100 and got[1]["name"] == "Alice"
    assert got[2]["ID"] == 101 and got[2]["name"] is None
    assert got[3] is None or (got[3]["ID"] is None and got[3]["name"] is None)


def test_registry_latest():
    from zync_spark.sources.registry import MemoryRegistry

    reg = MemoryRegistry()
    reg.register("zng_aaa", '{"type":"record","name":"a","fields":[]}')
    reg.register("zng_aaa", '{"type":"record","name":"a2","fields":[]}')
    latest = reg.latest("zng_aaa")
    assert latest["version"] == 2 and latest["schema"]["name"] == "a2"
