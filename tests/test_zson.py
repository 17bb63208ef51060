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


# -- reader ---------------------------------------------------------------


def test_reads_reference_demo_batch_verbatim(spark):
    """demo/batch-1.zson (the reference's OWN demo input, multi-line with
    comments) parses into the fused null-padded envelope frame."""
    df, names = zson.read(spark, "/root/reference/demo/batch-1.zson")
    assert names == {}
    rows = df.collect()
    assert len(rows) == 4
    inv = [r for r in rows if r["kafka"]["topic"] == "Invoices"]
    st = [r for r in rows if r["kafka"]["topic"] == "InvoiceStatus"]
    assert {r["value"]["after"]["customer"] for r in inv} == {"Alice", "Bob"}
    # InvoiceStatus rows: customer/item null-padded, status present
    assert {r["value"]["after"]["status"] for r in st} == {"pending"}
    assert all(r["value"]["after"]["customer"] is None for r in st)


def test_generated_etl_program_over_real_demo_input(spark):
    """End-to-end parity: the reference's generated ETL program
    (ztests/etl-zed.yaml) run over the reference's ACTUAL batch-1.zson —
    no hand-built fixtures anywhere — reproduces the etl-demo ztest's
    documented records AND prints them byte-identical in ZSON."""
    from zync_spark.zedpipe import compile_query

    raw_txt = open("/root/reference/ztests/etl-zed.yaml").read()
    start = raw_txt.index("type done")
    prog = "\n".join(
        line[6:] if line.startswith("      ") else line
        for line in raw_txt[start:].splitlines())
    prog = prog[:prog.index("| sort kafka.offset")
                + len("| sort kafka.offset")]

    raw, _ = zson.read(spark, "/root/reference/demo/batch-1.zson")
    # batch 1 is all op:"r" creates — no `before` images yet. The program
    # references value.before, which a real pool's unified schema grows
    # as update batches land; fill() applies that widening up front (the
    # shaper verb = the envelope substitution's schema union).
    from pyspark.sql.types import StructType as _St

    from zync_spark.envelope import fill
    raw = fill(raw, _St.fromDDL(
        "kafka struct<topic:string,offset:long>, key struct<ID:long>, "
        "value struct<op:string,"
        "after:struct<ID:long,customer:string,item:string,"
        "InvoiceID:long,status:string>,"
        "before:struct<ID:long,customer:string,item:string,"
        "InvoiceID:long,status:string>>"))
    staging = spark.createDataFrame(
        [], "kafka struct<topic:string,offset:long>, zed_type string")
    out = compile_query(prog, {"Raw": raw, "Staging": staging})
    rows = out.collect()
    data = sorted((r for r in rows if r["key"] is not None),
                  key=lambda r: r["key"]["ID"])
    # Output offsets are assigned by the HOST, not the zed program
    # (etl/pipeline.go:127-164; zedpipe's q_offset_assign) — start the
    # fresh output topic at 0, like the reference against an empty
    # Staging, then render in the ztest's column order.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("kafka.topic").orderBy("kafka.offset")
    sel = (out.filter(F.col("key").isNotNull())
           .withColumn("kafka", F.struct(
               F.col("kafka.topic").alias("topic"),
               (F.row_number().over(w) - 1).cast("long").alias("offset")))
           .select("key", "value", "kafka"))
    printed = sorted(zson.render_row(r, sel.schema) for r in sel.collect())
    assert printed == [
        '{key:{ID:100},value:{ID:100,customer:"Alice",item:"taco",'
        'invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:0}}',
        '{key:{ID:101},value:{ID:101,customer:"Bob",item:"burrito",'
        'invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:1}}',
    ]
    assert len(data) == 2


def test_writer_reader_round_trip(spark):
    """render_row → parse → the same values, schema shape, and
    decorations (the registry rides the text both ways)."""
    ddl = ("kafka struct<topic:string,offset:long>, "
           "value struct<n:long,tags:array<string>,score:double>, "
           "zed_type string")
    df = spark.createDataFrame(
        [(("T", 1), (5, ["a", "b"], 1.5), "data"),
         (("T", 2), None, "done")], ddl)
    names = {"value": "rec_t"}
    text = "\n".join(zson.render_row(r, df.schema, names)
                     for r in df.collect())
    rows, schema, names2 = zson.parse(text)
    assert names2 == {"value": "rec_t"}
    assert [f.name for f in schema.fields] == ["kafka", "value", "zed_type"]
    assert rows[0][1] == (5, ["a", "b"], 1.5)
    assert rows[1][1] is None and rows[1][2] == "done"


def test_parse_errors_are_controlled():
    import pytest

    for bad in ['{a:}', '{a:1', '"unterminated', '{a:1}(=)', '[1,&]',
                '42']:
        with pytest.raises(zson.ZsonParseError):
            zson.parse(bad)


def test_cli_produce_zson_demo_file(spark, tmp_path, capsys):
    """`produce --format zson` loads the reference's own demo file into a
    pool; consume round-trips it back out as ZSON text."""
    import os

    from zync_spark.cli import main

    lake = str(tmp_path)
    assert main(["--lake", lake, "produce",
                 "/root/reference/demo/batch-1.zson",
                 "--pool", "Raw", "--format", "zson"]) == 0
    assert "loaded 4 records" in capsys.readouterr().out
    assert main(["--lake", lake, "consume", "Invoices", "--pool", "Raw",
                 "--format", "zson"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith(
        '{kafka:{topic:"Invoices",offset:1},key:{ID:100},'
        'value:{op:"r",after:{ID:100,customer:"Alice",item:"taco"}}}')


def test_invoices_fixtures_match_reference_demo_files(spark):
    """The hand-maintained CDC fixtures (tests/fixtures_invoices.py,
    feeding the golden ETL tests) must be faithful transcriptions of
    demo/batch-1..4.zson. The ZSON writer is the canonicalizer: render
    both sides' non-null projections and compare text (the fixtures add
    kafka.partition=0, which the files don't carry — dropped first)."""
    from pyspark.sql import functions as F

    from tests.fixtures_invoices import BATCHES, ROW_SCHEMA

    for i, batch in enumerate(BATCHES, 1):
        ref, _ = zson.read(spark, f"/root/reference/demo/batch-{i}.zson")
        fix = spark.createDataFrame(batch, ROW_SCHEMA).withColumn(
            "kafka", F.struct(F.col("kafka.topic").alias("topic"),
                              F.col("kafka.offset").alias("offset")))
        canon = lambda df: sorted(
            zson.render_row(r, df.schema) for r in df.collect())
        assert canon(fix) == canon(ref), f"batch-{i}"


def test_unicode_and_widened_numbers_round_trip(spark):
    """Round-4 review regressions: \\uXXXX escapes must decode (and
    non-ASCII must survive consume→produce), and int literals under a
    long/double-widened field must load into Spark."""
    rows, schema, _ = zson.parse('{s:"caf\\u00e9"} {s:"naïve"}')
    assert [r[0] for r in rows] == ["café", "naïve"]
    # writer emits raw UTF-8; the reader accepts both forms
    txt = zson.render("café", schema["s"].dataType)
    assert txt == '"café"'
    assert zson.parse("{s:" + txt + "}")[0] == [("café",)]
    df, _ = zson.read(spark, '{a:1} {a:1.5}')
    vals = sorted(r["a"] for r in df.collect())
    assert vals == [1.0, 1.5] and df.schema["a"].dataType.typeName() == "double"


def test_typed_nulls_mirror_connectjson_cases(spark):
    """The connectjson_test.go typed-null shapes parse: null({}),
    null(named={}), null(string), and a typed null that merges with a
    sibling value's shape."""
    rows, schema, names = zson.parse(
        '{a:null({id:int32,name:string})} {a:{id:5(int32),name:"x"}}')
    assert names == {}
    assert schema["a"].dataType.simpleString() == "struct<id:int,name:string>"
    assert rows[0] == (None,) and rows[1] == ((5, "x"),)
    # named typed null: the decoration lands in the registry
    rows, schema, names = zson.parse('{a:null(named={})}')
    assert names == {"a": "named"} and rows == [(None,)]
    assert schema["a"].dataType.typeName() == "struct"
    # bare typed null primitive
    rows, schema, _ = zson.parse('{s:null(string)} {s:"x"}')
    assert rows == [(None,), ("x",)]
    assert schema["s"].dataType.typeName() == "string"
    # root named empty record, connectjson's `{}(=named)`
    rows, schema, _ = zson.parse('{}(=named)')
    assert [f.name for f in schema.fields] == ["zed_type"]
    assert rows == [("named",)]


def test_time_nan_inf_literals_round_trip(spark):
    """Round-4 ADVICE closure: every form the WRITER emits must parse
    back — timestamps (2024-01-02T03:04:05Z), dates, NaN/+Inf/-Inf —
    so consume --format zson output reloads via produce --format zson."""
    from pyspark.sql.types import (DateType, DoubleType, StructField,
                                   StructType, TimestampType)

    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    d = datetime.date(2024, 1, 2)
    schema = StructType([StructField("t", TimestampType()),
                         StructField("d", DateType()),
                         StructField("x", DoubleType())])
    for x, lit in [(float("nan"), "NaN"), (float("inf"), "+Inf"),
                   (float("-inf"), "-Inf")]:
        df = spark.createDataFrame([(ts, d, x)], schema)
        line = zson.render_row(df.collect()[0], schema)
        assert "2024-01-02T03:04:05Z" in line and lit in line
        rows, sch, _ = zson.parse(line)
        assert sch["t"].dataType.typeName() == "timestamp"
        assert sch["d"].dataType.typeName() == "date"
        assert rows[0][0] == ts and rows[0][1] == d
        if lit == "NaN":
            assert rows[0][2] != rows[0][2]
        else:
            assert rows[0][2] == x
    # fractional seconds and explicit offsets normalize to naive UTC
    rows, _, _ = zson.parse('{t:2024-01-02T03:04:05.25Z}')
    assert rows[0][0] == datetime.datetime(2024, 1, 2, 3, 4, 5, 250000)
    rows, _, _ = zson.parse('{t:2024-01-02T05:04:05+02:00}')
    assert rows[0][0] == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_int_width_merge_widens_not_errors():
    """{a:5(int32)} then {a:9} is valid reference ZSON (zed fuse widens
    to int64); mixed narrower widths take the wider int, int+float32
    takes float64."""
    rows, schema, _ = zson.parse('{a:5(int32)} {a:9}')
    assert schema["a"].dataType.typeName() == "long"
    assert rows == [(5,), (9,)]
    rows, schema, _ = zson.parse('{a:5(int8)} {a:9(int16)}')
    assert schema["a"].dataType.typeName() == "short"
    rows, schema, _ = zson.parse('{a:5(int32)} {a:1.5(float32)}')
    assert schema["a"].dataType.typeName() == "double"
    assert rows == [(5.0,), (1.5,)]


def test_hex_and_size_guard_errors_are_controlled(tmp_path):
    import pytest

    with pytest.raises(zson.ZsonParseError):  # odd-length 0x literal
        zson.parse('{b:0xabc}')
    big = tmp_path / "big.zson"
    big.write_text("{a:1}\n" * 10)
    with pytest.raises(zson.ZsonParseError, match="driver"):
        zson.read(None, str(big), max_bytes=16)


# -- read_lines: the distributed line-delimited path -----------------------


def test_read_lines_matches_driver_read_on_reference_demo(spark, tmp_path):
    # the reference demo file is pretty-printed, so it goes through the
    # driver reader; render_row re-emits it line-delimited, and the
    # distributed reader must reproduce the driver result exactly
    src = "/root/reference/demo/batch-1.zson"
    want_df, want_names = zson.read(spark, src)
    ld = tmp_path / "batch-1.lines.zson"
    ld.write_text("".join(
        zson.render_row(r, want_df.schema, want_names) + "\n"
        for r in want_df.collect()))
    got_df, got_names = zson.read_lines(spark, str(ld))
    assert got_df.schema == want_df.schema
    assert got_names == want_names
    assert sorted(map(tuple, got_df.collect())) == sorted(
        map(tuple, want_df.collect()))


def test_read_lines_fuses_shapes_across_partitions(spark, tmp_path):
    # shape widening must happen globally, not per-line: int32 then
    # int64, a late-appearing field, and a named decoration
    p = tmp_path / "wide.zson"
    p.write_text(
        "{a:5(int32)}\n"
        "\n"
        "{a:9,b:\"x\"}(=thing)\n"
        "{a:7,c:1.5}\n")
    df, names = zson.read_lines(spark, str(p))
    driver_df, driver_names = zson.read(spark, p.read_text())
    assert df.schema == driver_df.schema
    assert names == driver_names
    assert sorted(map(tuple, df.collect()), key=str) == sorted(
        map(tuple, driver_df.collect()), key=str)
    assert [f.name for f in df.schema.fields][-1] == "zed_type"


def test_read_lines_rejects_pretty_printed(spark, tmp_path):
    # values spanning lines violate the line-delimited contract; the
    # executor-side error must surface and name it
    p = tmp_path / "pretty.zson"
    p.write_text("{\n  a: 1\n}\n")
    import pytest

    with pytest.raises(Exception, match="line-delimited|Unexpected|expected"):
        zson.read_lines(spark, str(p))[0].collect()


def test_read_lines_empty_file(spark, tmp_path):
    p = tmp_path / "empty.zson"
    p.write_text("\n// just a comment\n")
    df, names = zson.read_lines(spark, str(p))
    assert df.count() == 0 and names == {}
