"""Property-based tests (hypothesis): the zedexpr parser agrees with
Python on randomly generated expressions (precedence, associativity,
boolean logic), strftime conversion agrees with C strftime, and the
dotted shapers are exact inverses on random nested schemas.

Each example costs a tiny local collect, so example counts are capped —
the value is in the generator coverage (operator interleavings the
hand-written tests never try), not raw volume.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from zync_spark.zedexpr import Context, compile_expr

VARS = {"n": 7, "m": -3, "p": 12}

_PROPS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def arith_exprs(draw, depth=0):
    """Expression strings over + - * with OPTIONAL parens — the expected
    value comes from Python eval of the same string, so unparenthesized
    nestings genuinely test that zedexpr's precedence/associativity agree
    with Python's (identical for + - *)."""
    if depth >= 3 or draw(st.booleans()):
        if draw(st.booleans()):
            return draw(st.sampled_from(sorted(VARS)))
        return str(draw(st.integers(-50, 50)))
    ls = draw(arith_exprs(depth=depth + 1))
    rs = draw(arith_exprs(depth=depth + 1))
    op = draw(st.sampled_from(["+", "-", "*"]))
    if draw(st.booleans()):
        return f"({ls} {op} {rs})"
    return f"{ls} {op} {rs}"


@st.composite
def bool_exprs(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        ls, rs = draw(arith_exprs()), draw(arith_exprs())
        op = draw(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]))
        return f"{ls} {op} {rs}"
    ls = draw(bool_exprs(depth=depth + 1))
    rs = draw(bool_exprs(depth=depth + 1))
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        return f"not ({ls})"
    # and/or operands parenthesized: zed's `and` binds tighter over
    # comparisons the same way, but chained mixed and/or without parens is
    # covered by the same-precedence-as-Python property only when grouped
    return f"({ls}) {kind} ({rs})"


def _py_eval(src: str):
    return eval(src, {"__builtins__": {}}, dict(VARS))  # noqa: S307 - test-generated input only


@pytest.fixture(scope="module")
def row_df(spark):
    return spark.createDataFrame([tuple(VARS.values())],
                                 ", ".join(f"{k} long" for k in VARS))


@_PROPS
@given(src=arith_exprs())
def test_arithmetic_matches_python(row_df, src):
    got = row_df.select(compile_expr(src, Context()).alias("x")).collect()[0]["x"]
    assert got == _py_eval(src), src


@_PROPS
@given(src=bool_exprs())
def test_boolean_matches_python(row_df, src):
    got = row_df.select(compile_expr(src, Context()).alias("x")).collect()[0]["x"]
    assert bool(got) == bool(_py_eval(src)), src


_CODES = ["%Y", "%m", "%d", "%H", "%M", "%S", "%y", "%j", "%b", "%a"]


@_PROPS
@given(
    codes=st.lists(st.sampled_from(_CODES), min_size=1, max_size=4),
    epoch=st.integers(0, 2_000_000_000),
)
def test_strftime_matches_c_library(spark, codes, epoch):
    fmt = "-".join(codes)
    dt = datetime.datetime.fromtimestamp(epoch, datetime.timezone.utc)
    expected = dt.strftime(fmt)
    df = spark.createDataFrame([(epoch,)], "e long")
    got = df.select(
        compile_expr(f'strftime("{fmt}", ts)',
                     Context(roots={"ts": F.timestamp_seconds(F.col("e"))}))
        .alias("x")
    ).collect()[0]["x"]
    assert got == expected, fmt


@st.composite
def dotted_names(draw):
    """A set of non-colliding dotted column names (no name is a prefix-path
    of another)."""
    segs = ["a", "b", "c", "d"]
    paths = draw(
        st.sets(
            st.lists(st.sampled_from(segs), min_size=1, max_size=3).map(tuple),
            min_size=1,
            max_size=6,
        )
    )
    names = []
    for p in sorted(paths):
        if any(other != p and other[: len(p)] == p for other in paths):
            continue  # p is an interior node of another path
        names.append(".".join(p))
    return names or ["a"]


@_PROPS
@given(names=dotted_names())
def test_nest_flatten_inverse_property(spark, names):
    from zync_spark import envelope as E

    df = spark.createDataFrame(
        [tuple(range(len(names)))], ", ".join(f"c{i} long" for i in range(len(names)))
    ).select(*[F.col(f"c{i}").alias(n) for i, n in enumerate(names)])
    back = E.flatten_dotted(E.nest_dotted(df))
    # flatten∘nest preserves the leaf set and values; order may regroup by
    # top-level segment, so compare as sets/dicts
    assert {f.name for f in back.schema.fields} == set(names)
    row = back.collect()[0]
    orig = df.collect()[0]
    assert {n: row[n] for n in names} == {n: orig[n] for n in names}
