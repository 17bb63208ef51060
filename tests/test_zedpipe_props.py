"""Property-based differential tests for the zed pipeline compiler:
randomly composed pipelines over a small frame must agree with a pandas
model of the same stages. The generators exercise stage interleavings
(filter→put→cut→sort→head chains, agg placement) the hand-written tests
never enumerate.

Example counts are capped — each example costs a local collect; the value
is generator coverage, not volume."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zync_spark.zedpipe import compile_pipeline

_PROPS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = [
    (0, "a", 5, 2.0),
    (1, "b", 3, 8.0),
    (2, "a", 9, 1.5),
    (3, "c", 3, 4.0),
    (4, "b", 7, 8.0),
    (5, "a", 5, 0.5),
]
COLS = ["id", "g", "n", "x"]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "id long, g string, n long, x double")


def model() -> pd.DataFrame:
    return pd.DataFrame(ROWS, columns=COLS)


_OPS = {
    ">": lambda s, v: s > v, ">=": lambda s, v: s >= v,
    "<": lambda s, v: s < v, "<=": lambda s, v: s <= v,
    "==": lambda s, v: s == v, "!=": lambda s, v: s != v,
}


@st.composite
def filter_stage(draw):
    col = draw(st.sampled_from(["id", "n"]))
    op = draw(st.sampled_from(sorted(_OPS)))
    lit = draw(st.integers(0, 9))
    form = draw(st.sampled_from(["where {}", "{}"]))
    # vectorized mask (a .map-based mask dtypes to object on an empty
    # frame and pandas then misreads it as column selection)
    return (
        form.format(f"{col} {op} {lit}"),
        lambda p, c=col, o=op, v=lit: p[_OPS[o](p[c], v)],
    )


@st.composite
def put_stage(draw):
    a = draw(st.integers(1, 5))
    b = draw(st.integers(0, 5))
    src = f"y := n * {a} + {b}"
    return (
        draw(st.sampled_from(["put {}", "{}"])).format(src),
        lambda p: p.assign(y=p["n"] * a + b),
    )


@st.composite
def sort_head_stage(draw):
    key = draw(st.sampled_from(["id", "n", "x"]))
    desc = draw(st.booleans())
    k = draw(st.integers(1, 6))
    keys = [key] if key == "id" else [key, "id"]  # id = unique tiebreak
    stage = f"sort {'-r ' if desc else ''}{', '.join(keys)} | head {k}"

    def apply(p):
        return p.sort_values(keys, ascending=not desc).head(k)

    return (stage, apply)


@given(st.lists(st.one_of(filter_stage(), put_stage()), min_size=1,
                max_size=4), sort_head_stage())
@_PROPS
def test_random_pipeline_matches_pandas(df, stages, tail):
    """filter/put chains in random order, closed with a deterministic
    sort|head: row sets and computed columns must agree with pandas."""
    src = " | ".join([s for s, _ in stages] + [tail[0]])
    got = compile_pipeline(df, src).toPandas()
    want = model()
    for _, fn in stages:
        want = fn(want)
    want = tail[1](want)
    got_t = [tuple(r) for r in got[sorted(got.columns)].itertuples(index=False)]
    want_t = [tuple(r) for r in
              want[sorted(got.columns)].itertuples(index=False)]
    assert sorted(got_t) == sorted(want_t), src


@given(st.sampled_from(["g", "n"]),
       st.sampled_from(["count()", "sum(x)", "min(n)", "max(x)",
                        "avg(x)", "countdistinct(g)"]))
@_PROPS
def test_agg_by_matches_pandas(df, key, agg):
    src = f"{agg} by {key}"
    got = compile_pipeline(df, src).toPandas()
    p = model()
    fn = agg.split("(")[0]
    target = agg[agg.index("(") + 1:-1] or None
    gb = p.groupby(key)
    if fn == "count":
        want = gb.size()
    elif fn == "countdistinct":
        want = gb[target].nunique()
    else:
        want = getattr(gb[target], {"avg": "mean"}.get(fn, fn))()
    got_m = {r[key]: r[got.columns[-1]] for _, r in got.iterrows()}
    want_m = want.to_dict()
    assert set(got_m) == set(want_m), src
    for k in want_m:
        assert got_m[k] == pytest.approx(want_m[k]), src


@given(st.lists(st.sampled_from(COLS), min_size=1, max_size=4, unique=True))
@_PROPS
def test_cut_keeps_exactly(df, cols):
    out = compile_pipeline(df, "cut " + ", ".join(cols))
    assert out.columns == cols


@given(st.integers(1, 6), st.sampled_from(["id", "n", "x"]))
@_PROPS
@pytest.mark.slow
def test_head_tail_partition_sorted_frame(df, k, key):
    """sort k | head N ∪ tail (len-N) is exactly the frame."""
    asc = compile_pipeline(df, f"sort {key}, id")
    head = compile_pipeline(df, f"sort {key}, id | head {k}").collect()
    tail = compile_pipeline(
        df, f"sort {key}, id | tail {len(ROWS) - k}").collect()
    whole = sorted(tuple(r) for r in asc.collect())
    assert sorted(tuple(r) for r in head + tail) == whole


# ---- round-2 operators: ordered collect, top, from/anti join ------------


@given(desc=st.booleans(), by_g=st.booleans(),
       nparts=st.integers(1, 6))
@_PROPS
def test_ordered_collect_matches_pandas(df, desc, by_g, nparts):
    """collect after sort == pandas sort+groupby-collect, under ANY input
    partitioning (ties on the sort key break on the collected value)."""
    flag = "-r " if desc else ""
    key = "g" if by_g else "n"
    out = compile_pipeline(
        df.repartition(nparts), f"sort {flag}x, id | vs:=collect(id) by {key}")
    got = {r[key]: list(r["vs"]) for r in out.collect()}
    m = model().sort_values(["x", "id"], ascending=not desc)
    want = m.groupby(key)["id"].apply(list).to_dict()
    assert got == want


@given(n=st.integers(1, 7))
@_PROPS
def test_top_selects_largest_key_multiset(df, n):
    out = compile_pipeline(df, f"top {n} n")
    got = sorted(r["n"] for r in out.collect())
    want = sorted(model()["n"].nlargest(n).tolist())
    assert got == want


@given(left_keys=st.lists(st.integers(0, 5), max_size=6, unique=True),
       right_keys=st.lists(st.integers(0, 5), max_size=6, unique=True))
@_PROPS
def test_anti_join_is_set_difference(spark, left_keys, right_keys):
    from zync_spark.zedpipe import compile_query

    a = spark.createDataFrame([(k, k * 10) for k in left_keys] or [(None, None)],
                              "k long, v long").filter("k is not null")
    b = spark.createDataFrame([(k,) for k in right_keys] or [(None,)],
                              "k long").filter("k is not null")
    out = compile_query(
        "from ( pool a => pass  pool b => pass ) | anti join on k=k",
        {"a": a, "b": b})
    got = sorted(r["k"] for r in out.collect())
    assert got == sorted(set(left_keys) - set(right_keys))


def test_parser_fuzz_never_crashes_uncontrolled(spark):
    """Random token soup must either compile, raise ZedSyntaxError, or
    surface a Spark analysis error — never an uncontrolled Python
    exception (IndexError/KeyError/AttributeError from parser internals).
    Deterministic seed; the generator alphabet covers every operator
    keyword and the sentinel-producing literals (durations, typeof)."""
    import random

    from zync_spark.zedexpr import ZedSyntaxError
    from zync_spark.zedpipe import compile_pipeline

    df = spark.createDataFrame([(1, "a", 2.0)], "id long, g string, x double")
    pieces = [
        "sort", "id", "|", "(", ")", "=>", "case", "switch", "fork", "from",
        "pool", "join", "anti", "on", "=", ":=", "yield", "{", "}", ",",
        "cut", "top", "over", "grep", '"s"', "collect", "by", "tail",
        "is", "<", ">", "type", "const", "every", "1h", "3", "this", "put",
        "cast", "typeof", "drop", "rename", "head", "uniq", "where", "-",
        "[", "]", "in", "not", "and", "or", "null", "true", "0.5", "default",
        "sum", "union", "count", "dcount", "any", "collect_map", "fuse",
        "pass", "with", "over", "compact", "flatten", "assert", "shape",
        "fill", "crop", "order",
    ]
    rng = random.Random(20260814)
    allowed = ("AnalysisException", "Py4JJavaError", "IllegalArgumentException")
    for _ in range(400):
        prog = " ".join(
            rng.choice(pieces) for _ in range(rng.randint(1, 10)))
        try:
            compile_pipeline(df, prog)
        except ZedSyntaxError:
            pass
        except Exception as e:  # noqa: BLE001
            assert type(e).__name__ in allowed, (prog, type(e).__name__, e)


# ---- round-3 semantics: leg invalidation, expression sort keys ----------


@given(mid=st.sampled_from(["where k >= 0", "head 9", "uniq",
                            "k2 := k + 1", "sort k"]))
@_PROPS
def test_join_after_intervening_stage_raises(spark, mid):
    """ANY stage between a two-source from block and a join invalidates
    the legs: the join must raise (round-3 fix — previously the stage was
    silently ignored and the join consumed pre-stage legs)."""
    from zync_spark.zedexpr import ZedSyntaxError
    from zync_spark.zedpipe import compile_query

    a = spark.createDataFrame([(1, 10)], "k long, v long")
    b = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ZedSyntaxError, match="two-source from block"):
        compile_query(
            f"from ( pool a => pass  pool b => pass ) | {mid} "
            "| join on k=k", {"a": a, "b": b})


@given(desc=st.booleans(), nparts=st.integers(1, 6))
@_PROPS
def test_ordered_collect_expression_key(df, desc, nparts):
    """Expression sort keys (`0 - x`) keep ordered-collect semantics —
    the round-3 resolvability fix recompiles the captured tokens instead
    of guessing from the head identifier (which silently dropped the
    order for non-column keys)."""
    flag = "-r " if desc else ""
    out = compile_pipeline(
        df.repartition(nparts), f"sort {flag}0 - x, id | vs:=collect(id) by g")
    got = {r["g"]: list(r["vs"]) for r in out.collect()}
    m = model().assign(negx=-model()["x"]).sort_values(
        ["negx", "id"], ascending=not desc)
    want = m.groupby("g")["id"].apply(list).to_dict()
    assert got == want
