"""Unit tests for the zed-expression → Column translator (SURVEY §2.8)."""

import pytest

from pyspark.sql import functions as F

from zync_spark.zedexpr import (
    Context,
    ZedSyntaxError,
    compile_assignments,
    compile_expr,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("c", 5, "Taco", 2.5), ("u", 9, "Beans", 1.0)],
        "op string, n long, name string, price double",
    )


def _vals(df, col):
    return [r[0] for r in df.select(col.alias("x")).collect()]


def test_comparisons_and_in(df):
    assert _vals(df, compile_expr('op == "c"', Context())) == [True, False]
    assert _vals(df, compile_expr('op in ["c", "r"]', Context())) == [True, False]
    assert _vals(df, compile_expr("n >= 6 and op == \"u\"", Context())) == [False, True]
    assert _vals(df, compile_expr("not (n < 6)", Context())) == [False, True]


def test_arithmetic(df):
    assert _vals(df, compile_expr("n * 2 + 1", Context())) == [11, 19]
    assert _vals(df, compile_expr("price / 2", Context())) == [1.25, 0.5]
    assert _vals(df, compile_expr("n % 4", Context())) == [1, 1]


def test_functions(df):
    assert _vals(df, compile_expr("to_upper(name)", Context())) == ["TACO", "BEANS"]
    assert _vals(df, compile_expr('split(name, "a")', Context())) == [
        ["T", "co"],
        ["Be", "ns"],
    ]


def test_record_literal(df):
    rows = df.select(
        compile_expr('{upper: to_upper(name), words: split(name, "a"), n: n}', Context()).alias("r")
    ).collect()
    assert rows[0]["r"]["upper"] == "TACO"
    assert rows[0]["r"]["n"] == 5


def test_assignments_with_roots(spark):
    df = spark.createDataFrame([((1, "x"),)], "rec struct<id:long, s:string>")
    ctx = Context(roots={"in": F.col("rec")})
    assigns = compile_assignments("| out := {key: in.id, value: {s: in.s}}", ctx)
    assert list(assigns) == ["out"]
    row = df.select(assigns["out"].alias("o")).collect()[0]
    assert row["o"]["key"] == 1 and row["o"]["value"]["s"] == "x"


def test_cast_typeof_null(spark):
    df = spark.createDataFrame([((1, "x"),)], "rec struct<id:long, s:string>")
    ctx = Context(roots={"in": F.col("rec")}, schema=df.schema.fields[0].dataType and df.schema)
    # build a root schema where `in` maps to the rec struct
    from pyspark.sql.types import StructField, StructType

    ctx = Context(
        roots={"in": F.col("rec")},
        schema=StructType([StructField("in", df.schema.fields[0].dataType)]),
    )
    col = compile_expr("cast(null, typeof(in))", ctx)
    row = df.select(col.alias("x")).collect()[0]
    assert row["x"] is None
    assert df.select(col.alias("x")).schema.fields[0].dataType == df.schema.fields[0].dataType


def test_syntax_errors():
    with pytest.raises(ZedSyntaxError):
        compile_expr("a ~~ b", Context())
    with pytest.raises(ZedSyntaxError):
        compile_expr("unknown_fn(1)", Context())
    with pytest.raises(ZedSyntaxError):
        compile_expr("{a: }", Context())


def test_map_literal_lookup(df):
    # demo/etl.zed:1-9,15: const map + bracket lookup, no join in the plan
    assert _vals(
        df, compile_expr('|{"Taco": 100, "Beans": 200}|[name]', Context())
    ) == [100, 200]
    assert _vals(df, compile_expr("|{}|", Context()).cast("string")) == ["{}", "{}"]


def test_array_literal(df):
    assert _vals(df, compile_expr('["a", name]', Context())) == [
        ["a", "Taco"],
        ["a", "Beans"],
    ]
    assert _vals(df, compile_expr('["x", "y"][0]', Context())) == ["x", "x"]


def test_const_prologue(df):
    src = """
    const menuIDs = |{
        "Taco": 100,
        "Beans": 200
    }|;
    const markup = 2;
    {menuID: menuIDs[name], total: price * markup}
    """
    rows = df.select(compile_expr(src, Context()).alias("r")).collect()
    assert [(r["r"]["menuID"], r["r"]["total"]) for r in rows] == [
        (100, 5.0),
        (200, 2.0),
    ]


def test_const_prologue_in_assignments(spark):
    df = spark.createDataFrame([(("jane", 3),)], "rec struct<customer:string, qty:long>")
    ctx = Context(roots={"in": F.col("rec")})
    assigns = compile_assignments(
        'const ids = |{"jane": 1, "bob": 2}|\n'
        "| out := {customerID: ids[in.customer], qty: in.qty}",
        ctx,
    )
    row = df.select(assigns["out"].alias("out")).collect()[0]
    assert row["out"]["customerID"] == 1 and row["out"]["qty"] == 3


def test_time_functions(spark):
    df = spark.createDataFrame(
        [("2024-03-05 10:47:33",), ("2024-03-05 11:02:10",)],
        "s string",
    ).select(F.col("s").cast("timestamp").alias("ts"))
    assert _vals(df, compile_expr("bucket(ts, 15m)", Context()).cast("string")) == [
        "2024-03-05 10:45:00",
        "2024-03-05 11:00:00",
    ]
    assert _vals(df, compile_expr("bucket(ts, 1h)", Context()).cast("string")) == [
        "2024-03-05 10:00:00",
        "2024-03-05 11:00:00",
    ]
    # numeric-seconds variant
    assert _vals(df, compile_expr("bucket(ts, 3600)", Context()).cast("string")) == [
        "2024-03-05 10:00:00",
        "2024-03-05 11:00:00",
    ]
    assert _vals(df, compile_expr('strftime("%Y-%m-%dT%H", ts)', Context())) == [
        "2024-03-05T10",
        "2024-03-05T11",
    ]
    # now() is a plan-time-stable timestamp column
    assert df.select(compile_expr("now()", Context()).alias("t")).schema[
        "t"
    ].dataType.typeName() == "timestamp"
    with pytest.raises(ZedSyntaxError):
        compile_expr("1h + 2", Context())
    with pytest.raises(ZedSyntaxError):
        compile_expr('strftime("%Q", ts)', Context())


def test_network_functions(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.2.0.9",), ("192.168.1.77",)], "ip string"
    )
    assert _vals(df, compile_expr('cidr_match("10.1.0.0/16", ip)', Context())) == [
        True,
        False,
        False,
    ]
    assert _vals(df, compile_expr('cidr_match("10.0.0.0/8", ip)', Context())) == [
        True,
        True,
        False,
    ]
    assert _vals(df, compile_expr("network_of(ip, 24)", Context())) == [
        "10.1.2.0/24",
        "10.2.0.0/24",
        "192.168.1.0/24",
    ]


def test_string_encoding_functions(df):
    assert _vals(df, compile_expr('levenshtein(name, "Tacos")', Context())) == [1, 4]
    assert _vals(df, compile_expr('hex("A")', Context())) == ["41", "41"]
    assert _vals(df, compile_expr('base64("hi")', Context())) == ["aGk=", "aGk="]
    assert _vals(df, compile_expr('position(name, "a")', Context())) == [2, 3]
    uri = compile_expr(
        'parse_uri("https://example.com/p/q?x=1#frag")', Context()
    )
    row = None
    row = df.limit(1).select(uri.alias("u")).collect()[0]["u"]
    assert row["scheme"] == "https" and row["host"] == "example.com"
    assert row["path"] == "/p/q" and row["query"] == "x=1" and row["fragment"] == "frag"


def test_has_missing(spark):
    from pyspark.sql.types import StructField, StructType

    df = spark.createDataFrame([((1, "x"),)], "rec struct<id:long, s:string>")
    ctx = Context(
        roots={"in": F.col("rec")},
        schema=StructType([StructField("in", df.schema.fields[0].dataType)]),
    )
    assert _vals(df, compile_expr("has(in.id)", ctx)) == [True]
    assert _vals(df, compile_expr("has(in.nope)", ctx)) == [False]
    assert _vals(df, compile_expr("missing(in.nope)", ctx)) == [True]
    # deep path through a non-struct → not present
    assert _vals(df, compile_expr("has(in.id.deeper)", ctx)) == [False]
    with pytest.raises(ZedSyntaxError):
        compile_expr("has(x)", Context())  # no schema to resolve against


def test_stdlib_functions(df):
    assert _vals(df, compile_expr('grep("^Ta", name)', Context())) == [True, False]
    assert _vals(df, compile_expr("floor(price)", Context())) == [2, 1]
    assert _vals(df, compile_expr("ceil(price)", Context())) == [3, 1]
    assert _vals(df, compile_expr("pow(n, 2)", Context())) == [25.0, 81.0]
    assert _vals(df, compile_expr('join(split(name, "a"), "-")', Context())) == [
        "T-co",
        "Be-ns",
    ]
    # as a filter predicate, the idiomatic zed use
    assert df.filter(compile_expr('grep("co$", name)', Context())).count() == 1


def test_array_stdlib_functions(spark):
    # compact / flatten / sort (function form; the operator form only
    # binds at stage-head position)
    from zync_spark.zedpipe import compile_pipeline

    df = spark.createDataFrame(
        [([3, None, 1], [[1, 2], [3]]),],
        "xs array<int>, nested array<array<int>>")
    out = compile_pipeline(
        df, "c := compact(xs) | f := flatten(nested) | s := sort(compact(xs))"
            " | cut c, f, s").collect()[0]
    assert list(out["c"]) == [3, 1]
    assert list(out["f"]) == [1, 2, 3]
    assert list(out["s"]) == [1, 3]


def test_shaper_trio_shape_fill_crop_order(spark):
    from zync_spark.zedpipe import compile_pipeline

    df = spark.createDataFrame(
        [(7, "x", 2.9, ("a", 5))],
        "b long, extra string, a double, nest struct<p:string,q:long>")
    prologue = (
        "type T = {a: int64, b: string, nest: {q: string, r: int64},"
        " missing: float64} | ")
    # shape: exactly T's fields in T's order, by-name casts (incl. nested
    # by-name recursion), absent -> null, value tagged with T
    out = compile_pipeline(df, prologue + "yield shape(this, T)")
    r = out.collect()[0]
    assert out.columns == ["a", "b", "nest", "missing", "zed_type"]
    assert (r["a"], r["b"], r["missing"], r["zed_type"]) == (2, "7", None, "T")
    assert (r["nest"]["q"], r["nest"]["r"]) == ("5", None)
    # fill: source fields + T-only fields appended as nulls
    out = compile_pipeline(df, prologue + "f := fill(this, T) | cut f")
    r = out.collect()[0]["f"]
    assert r["b"] == 7 and r["extra"] == "x" and r["missing"] is None
    # crop: only fields present in T, source types kept
    out = compile_pipeline(df, prologue + "c := crop(this, T) | cut c")
    row = out.collect()[0]["c"]
    assert set(row.asDict()) == {"b", "a", "nest"} and row["a"] == 2.9
    # order: T-order first, then the rest
    out = compile_pipeline(df, prologue + "o := order(this, T) | cut o")
    assert list(out.collect()[0]["o"].asDict()) == ["a", "b", "nest", "extra"]
