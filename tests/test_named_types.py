"""Nested named-type registry (round-4, SURVEY §1.2 closure).

Zed decorates values at any nesting depth with named types
(`{left:done,right:done}`, connectjson_test.go:22-33,
etl/pipeline.go:106). Spark's unified schema cannot hold a per-value
tag below the top level (where zed_type rides), so decorations live in
a PATH REGISTRY: {dotted path: name}, collected at compile time
(zedpipe names_out), persisted per pool (types.json sidecar,
Pool.load(type_names=)), carried on the Connect-JSON wire (schema
`name` fields), and consulted by typeof(path)/cast(x, typeof(path))."""

import json

from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.zedexpr import Context
from zync_spark.zedpipe import compile_pipeline

PROLOGUE = "type done = {kafka:{topic:string,offset:int64}}\n"


def _cdc(spark):
    return spark.createDataFrame(
        [(("T", 7),), (("U", 8),)],
        "kafka struct<topic:string,offset:long>")


def test_record_literal_tags_collect_into_names_out(spark):
    """The generated program's own idiom (ztests/etl-zed.yaml:47-48):
    done-marker PAIRS nested in a record literal. The coerced values land
    in the struct; the tags land in the registry."""
    names: dict = {}
    out = compile_pipeline(
        _cdc(spark),
        PROLOGUE + "yield {left: cast({kafka: kafka}, done),"
                   " right: cast({kafka: kafka}, done)} | sort left.kafka.offset",
        names_out=names)
    assert names == {"left": "done", "right": "done"}
    rows = out.collect()
    assert [r["left"]["kafka"]["topic"] for r in rows] == ["T", "U"]
    assert [r["right"]["kafka"]["offset"] for r in rows] == [7, 8]


def test_nested_literal_and_assignment_paths(spark):
    """Decorations compose through nesting ({a:{b:cast(...)}} → 'a.b')
    and through put-assignments (x.y := cast(...) → 'x.y')."""
    names: dict = {}
    compile_pipeline(
        _cdc(spark),
        PROLOGUE + "yield {a: {b: cast({kafka: kafka}, done)}}",
        names_out=names)
    assert names == {"a.b": "done"}
    names = {}
    compile_pipeline(
        _cdc(spark),
        PROLOGUE + "kafka.marker := cast({kafka: kafka}, done)",
        names_out=names)
    assert names == {"kafka.marker": "done"}


def test_typeof_consults_registry_and_retags(spark):
    """Reading decorations back: typeof(path) renders the name (usable as
    a value / group key — the shapes idiom over nested types), and
    cast(x, typeof(path)) re-coerces AND re-tags."""
    names: dict = {}
    df = compile_pipeline(
        _cdc(spark),
        PROLOGUE + "yield {left: cast({kafka: kafka}, done), n: 1}",
        names_out=names)
    ctx = Context(path_names=dict(names))
    out = compile_pipeline(df, "t := typeof(left)", ctx=ctx)
    assert {r["t"] for r in out.collect()} == {"done"}
    # group by the decoration
    grouped = compile_pipeline(df, "c := count() by t := typeof(left)",
                               ctx=Context(path_names=dict(names)))
    assert [(r["t"], r["c"]) for r in grouped.collect()] == [("done", 2)]
    # cast through typeof re-tags: a top-level yield expands to zed_type
    out2, names2 = None, {}
    out2 = compile_pipeline(
        df, "yield cast(left, typeof(left))",
        ctx=Context(path_names=dict(names)), names_out=names2)
    rows = out2.collect()
    assert {r["zed_type"] for r in rows} == {"done"}
    # typeof on an UNDECORATED path is still invalid as a value
    import pytest

    from zync_spark.zedexpr import ZedSyntaxError
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(df, "t := typeof(n)")


def test_is_path_form_consults_registry(spark):
    """Zed's two-arg is(path, <T>): tests a NESTED value's decoration
    against the path registry (frame-level in the unified-schema model,
    so it folds to a constant); the one-arg / this form keeps routing on
    zed_type."""
    names: dict = {}
    df = compile_pipeline(
        _cdc(spark),
        PROLOGUE + "yield {left: cast({kafka: kafka}, done), n: 1}",
        names_out=names)
    ctx = Context(path_names=dict(names))
    assert compile_pipeline(df, "where is(left, <done>)", ctx=ctx).count() == 2
    assert compile_pipeline(df, "where is(left, <other>)", ctx=ctx).count() == 0
    assert compile_pipeline(df, "where is(n, <done>)", ctx=ctx).count() == 0
    # this-form on a frame without a discriminator: statically false
    assert compile_pipeline(df, "where is(this, <done>)", ctx=ctx).count() == 0


def test_pool_sidecar_round_trip(spark, tmp_path):
    """Decorations persist with the pool (types.json), merge across
    loads, and survive reopen — the per-pool registry the reference's
    per-value type context makes implicit."""
    pool = Pool.create(spark, str(tmp_path / "P"))
    env = spark.createDataFrame(
        [((("T", 0, 0)), (5,), "data")],
        "kafka struct<topic:string,partition:long,offset:long>,"
        " key struct<ID:long>, zed_type string")
    pool.load(env, "b1", type_names={"value.after": "invoice_t"})
    pool.load(env, "b2", type_names={"key": "invoice_key"})
    assert Pool.open(spark, str(tmp_path / "P")).type_names() == {
        "value.after": "invoice_t", "key": "invoice_key"}
    # registry feeds query compilation over the pool
    ctx = Context(path_names=pool.type_names())
    out = compile_pipeline(pool.scan(), "t := typeof(key)", ctx=ctx)
    assert {r["t"] for r in out.collect()} == {"invoice_key"}


def test_connect_json_carries_decorations_end_to_end(spark):
    """consume→pool→produce parity: compile-collected decorations ride
    the Connect-JSON wire schema out and parse back in."""
    from zync_spark.sources import connectjson as cj

    dt = spark.createDataFrame(
        [((("T", 7),),)],
        "value struct<kafka:struct<topic:string,offset:long>>"
    ).schema["value"].dataType
    names = {"": "done_pair", "kafka": "kmeta"}
    wire = json.loads(json.dumps(cj.connect_schema(dt, names=names)))
    assert cj.schema_names(wire) == names
    assert cj.from_connect_schema(wire) == dt


def test_egress_rides_pool_decorations(spark, tmp_path):
    """ToKafka json egress reads the pool's types.json and stamps the
    decorations on the outgoing Connect schemas — the produce half of the
    consume→pool→produce decorator round-trip."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zync_spark.sources import connectjson as cj
    from zync_spark.streaming.to_kafka import ToKafka

    pool = Pool.create(spark, str(tmp_path / "Out"))
    env = spark.createDataFrame(
        [(("T", 0, 0), (1,), ("pending",), "data")],
        "kafka struct<topic:string,partition:long,offset:long>,"
        " key struct<ID:long>, value struct<status:string>, zed_type string")
    pool.load(env, "b", type_names={"key": "invoice_key",
                                    "value.status": "status_t"})
    tk = ToKafka(pool, StructType([StructField("ID", LongType())]),
                 StructType([StructField("status", StringType())]),
                 format="json")
    pages = []
    assert tk.sync("T", hwm=0, produce=lambda df: pages.append(df.collect())) == 1
    row = pages[0][0]
    kschema = json.loads(bytes(row["key"]).decode())["schema"]
    vschema = json.loads(bytes(row["value"]).decode())["schema"]
    assert cj.schema_names(kschema) == {"": "invoice_key"}
    assert cj.schema_names(vschema) == {"status": "status_t"}


def test_connect_json_named_value_round_trip(spark):
    """Value+type+decoration round-trip mirroring the reference's named
    cases (connectjson_test.go:22-33: `{}(=named)`, `{a:null(named={})}`,
    named nested records): Encode → wire → Decode recovers the value, the
    Spark type, AND the decorations — including on a NULL nested record,
    where the decoration lives purely in the schema."""
    from zync_spark.sources import connectjson as cj

    df = spark.createDataFrame(
        [((10, ("street", "city")), ), ((11, None), )],
        "value struct<id:long, before:struct<street:string,city:string>>")
    dt = df.schema["value"].dataType
    names = {"": "addr_rec", "before": "addr"}
    wired = df.select(
        cj.encode(F.col("value"), dt, names=names).alias("w")).collect()
    schemas = [json.loads(r["w"])["schema"] for r in wired]
    for s in schemas:
        assert cj.schema_names(s) == names
        assert cj.from_connect_schema(s) == dt
    # decode the payloads back through the wire-recovered schema
    back = spark.createDataFrame(
        [(r["w"],) for r in wired], "w string"
    ).select(cj.decode(F.col("w"), cj.from_connect_schema(schemas[0]))
             .alias("value")).collect()
    got = sorted((r["value"]["id"], r["value"]["before"]) for r in back)
    assert got[0] == (10, ("street", "city")) or got[0][0] == 10
    assert got[1][0] == 11 and got[1][1] is None


def test_assignment_seeds_absolute_decoration_paths(spark):
    """Round-4 review regression: tags nested inside a record literal on
    the RIGHT of an assignment decorate their absolute target path
    (marker := {left: cast(...)} → 'marker.left', not 'left')."""
    names: dict = {}
    compile_pipeline(
        _cdc(spark),
        PROLOGUE + "kafka2 := {left: cast({kafka: kafka}, done)}"
        .replace("kafka2", "kafka"),  # assign into an existing column
        names_out=names)
    assert names == {"kafka.left": "done"}
