"""ZSON writer (zync_spark/zson.py): the reference's own output text.

The exactness bar: the ETL demo's documented `zed query -z` lines
(ztests/etl-demo.yaml:28-37) must come out of render_row byte-identical
— per-value shapes reconstructed from the null-padded unified schema,
done markers decorated, strings quoted, longs plain."""

import datetime

from zync_spark import zson

ENV_DDL = (
    "key struct<ID:long>, "
    "value struct<ID:long,customer:string,item:string,invoice_status:string>, "
    "kafka struct<topic:string,offset:long>, zed_type string")

# ztests/etl-demo.yaml:30-35 — batch 1's Staging contents, verbatim
EXPECTED = [
    '{key:{ID:100},value:{ID:100,customer:"Alice",item:"taco",'
    'invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:0}}',
    '{key:{ID:101},value:{ID:101,customer:"Bob",item:"burrito",'
    'invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:1}}',
    '{kafka:{topic:"Invoices",offset:1}}(=done)',
    '{kafka:{topic:"InvoiceStatus",offset:1}}(=done)',
]


def test_renders_reference_etl_output_verbatim(spark):
    rows = [
        ((100,), (100, "Alice", "taco", "pending"), ("NewInvoices", 0), "data"),
        ((101,), (101, "Bob", "burrito", "pending"), ("NewInvoices", 1), "data"),
        (None, None, ("Invoices", 1), "done"),
        (None, None, ("InvoiceStatus", 1), "done"),
    ]
    df = spark.createDataFrame(rows, ENV_DDL)
    got = [zson.render_row(r, df.schema) for r in df.collect()]
    assert got == EXPECTED


def test_scalar_and_container_forms(spark):
    """The connectjson_test.go-shaped scalar surface: implied types bare,
    narrower primitives decorated, zson float form, maps/arrays/binary,
    nested registry decorations."""
    ddl = ("a tinyint, b int, c long, d float, e double, f boolean, "
           "g string, h binary, i array<long>, j map<string,long>, "
           "k struct<x:long>, ts timestamp")
    df = spark.createDataFrame(
        [(8, 32, 64, 32.5, 64.0, True, 'say "hi"', bytearray(b"\x01\x23"),
          [1, 2], {"k": 7}, (5,),
          datetime.datetime(2024, 1, 2, 3, 4, 5))], ddl)
    r = df.collect()[0]
    sch = {f.name: f for f in df.schema.fields}

    def one(name, names=None):
        return zson.render(r[name], sch[name].dataType, names, name)

    assert one("a") == "8(int8)"
    assert one("b") == "32(int32)"
    assert one("c") == "64"
    assert one("d") == "32.5(float32)"
    assert one("e") == "64."                      # zson integral double
    assert one("f") == "true"
    assert one("g") == '"say \\"hi\\""'
    assert one("h") == "0x0123"
    assert one("i") == "[1,2]"
    assert one("j") == '|{"k":7}|'
    assert one("k") == "{x:5}"
    assert one("k", {"k": "pt"}) == "{x:5}(=pt)"  # registry decoration
    assert one("ts") == "2024-01-02T03:04:05Z"
    # null struct FIELD is absent; null in an array is a value
    df2 = spark.createDataFrame([((None, 2),)],
                                "s struct<p:long,q:long>")
    r2 = df2.collect()[0]
    assert zson.render(r2["s"], df2.schema["s"].dataType) == "{q:2}"


def test_cli_consume_zson_with_registry(spark, tmp_path, capsys):
    """consume --format zson prints the reference text form, with nested
    decorators pulled from the pool's types.json sidecar."""
    import os

    from zync_spark.cli import main
    from zync_spark.pool import Pool

    lake = str(tmp_path)
    pool = Pool.create(spark, os.path.join(lake, "P"))
    env = spark.createDataFrame(
        [((("T", 0, 0)), (1, "a"), "data"),
         ((("T", 0, 1)), None, "done")],
        "kafka struct<topic:string,partition:long,offset:long>,"
        " value struct<ID:long,name:string>, zed_type string")
    pool.load(env, "b", type_names={"value": "rec_t"})
    assert main(["--lake", lake, "consume", "T", "--pool", "P",
                 "--format", "zson"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines == [
        '{kafka:{topic:"T",partition:0,offset:0},'
        'value:{ID:1,name:"a"}(=rec_t)}',
        '{kafka:{topic:"T",partition:0,offset:1}}(=done)',
    ]
