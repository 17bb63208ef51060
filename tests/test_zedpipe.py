"""Unit tests for the zed PIPELINE compiler (zync_spark/zedpipe.py): the
reference's user-facing query language (`stage | stage | ...`,
cli/shaper.go:8-22, fifo/lake.go:94-106) compiled to DataFrame plans."""

import pytest

from zync_spark.zedexpr import ZedSyntaxError
from zync_spark.zedpipe import compile_pipeline, compile_query


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (0, "click", 10, 5.0, "a"),
            (1, "view", 11, 2.0, "b"),
            (2, "click", 10, 7.0, "c"),
            (3, "purchase", 12, 100.0, "d"),
            (4, "view", 10, 1.0, "e"),
        ],
        "id long, kind string, user long, amount double, tag string",
    )


@pytest.fixture(scope="module")
def nested(spark):
    return spark.createDataFrame(
        [(("t1", 0, 7), "k1", 1), (("t2", 0, 9), "k2", 2)],
        "kafka struct<topic:string,partition:long,offset:long>, "
        "key string, n long",
    )


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_bare_filter_and_where(ev):
    assert compile_pipeline(ev, 'kind == "click"').count() == 2
    assert compile_pipeline(ev, 'where amount > 4').count() == 3


def test_multi_stage_filter_put_cut(ev):
    out = compile_pipeline(
        ev, 'where kind == "click" | put double := amount * 2 '
            '| cut id, double | sort id')
    assert out.columns == ["id", "double"]
    assert rows(out) == [(0, 10.0), (2, 14.0)]


def test_yield_record_literal(ev):
    out = compile_pipeline(
        ev, 'yield {k: kind, loud: to_upper(tag)} | sort k, loud')
    assert out.columns == ["k", "loud"]
    assert rows(out)[0] == ("click", "A")


def test_yield_struct_path_expands(nested):
    # yield kafka — a struct-typed path expands to its fields
    # (the reference's `yield kafka` at fifo/lake.go:65)
    out = compile_pipeline(nested, "yield kafka | sort offset")
    assert out.columns == ["topic", "partition", "offset"]
    assert rows(out) == [("t1", 0, 7), ("t2", 0, 9)]


def test_yield_this_identity(ev):
    assert rows(compile_pipeline(ev, "yield this | sort id")) == rows(
        ev.orderBy("id"))


def test_yield_scalar_named_by_path(ev):
    out = compile_pipeline(ev, "yield amount")
    assert out.columns == ["amount"]


def test_yield_fanout_union(ev):
    # `yield a, b` emits one output value per expression per input row
    out = compile_pipeline(ev, "yield {v: amount}, {v: amount * 10}")
    assert out.count() == 10


def test_cut_nested_keeps_structure(nested):
    out = compile_pipeline(nested, "cut kafka.topic, n | sort n")
    assert out.columns == ["kafka", "n"]
    assert rows(out) == [(("t1",), 1), (("t2",), 2)]


def test_cut_with_rename_assignment(ev):
    out = compile_pipeline(ev, "cut id, loud:=to_upper(kind) | sort id")
    assert rows(out)[0] == (0, "CLICK")


def test_put_nested_withfield(nested):
    out = compile_pipeline(
        nested, "put kafka.offset := kafka.offset + 100 | sort n")
    assert rows(out)[0][0] == ("t1", 0, 107)


def test_drop_top_and_nested(nested, ev):
    assert compile_pipeline(ev, "drop tag, amount").columns == [
        "id", "kind", "user"]
    out = compile_pipeline(nested, "drop kafka.partition")
    assert out.select("kafka.*").columns == ["topic", "offset"]


def test_rename(ev):
    out = compile_pipeline(ev, "rename event_kind := kind")
    assert "event_kind" in out.columns and "kind" not in out.columns
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(ev, "rename a.b := kind")


def test_sort_head_topk(ev):
    out = compile_pipeline(ev, "sort -r amount | head 2 | cut amount")
    assert rows(out) == [(100.0,), (7.0,)]


def test_sort_nulls_last_both_directions(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "x long")
    asc = compile_pipeline(df, "sort x")
    assert [r[0] for r in asc.collect()] == [1, 3, None]
    desc = compile_pipeline(df, "sort -r x")
    assert [r[0] for r in desc.collect()] == [3, 1, None]


def test_tail_requires_sort(ev):
    with pytest.raises(ZedSyntaxError, match="tail requires"):
        compile_pipeline(ev, "tail 2")
    out = compile_pipeline(ev, "sort id | tail 2 | cut id")
    assert rows(out) == [(3,), (4,)]


def test_head_tail_default_one(ev):
    assert compile_pipeline(ev, "sort id | head").count() == 1
    assert rows(compile_pipeline(ev, "sort id | tail | cut id")) == [(4,)]


def test_uniq_and_fuse_pass(ev):
    out = compile_pipeline(ev, "cut kind | sort kind | uniq")
    assert out.count() == 3
    assert compile_pipeline(ev, "pass | fuse").count() == ev.count()


def test_agg_default_names(ev):
    out = compile_pipeline(ev, "count(), sum(amount) by kind | sort kind")
    assert out.columns == ["kind", "count", "sum"]
    assert rows(out)[0] == ("click", 2, 12.0)


def test_agg_named_and_global(ev):
    out = compile_pipeline(ev, "n := count(), hi := max(amount)")
    assert rows(out) == [(5, 100.0)]
    out2 = compile_pipeline(
        ev, "summarize total := sum(amount) by who := user | sort who")
    assert out2.columns == ["who", "total"]


def test_agg_union_sorted_deterministic(ev):
    out = compile_pipeline(
        ev, 'union(kind) by user | sort user | put kinds := join(union, ",") '
            '| drop union | cut user, kinds')
    assert rows(out) == [
        (10, "click,view"), (11, "view"), (12, "purchase")]


def test_agg_bool_and_collect(spark):
    df = spark.createDataFrame(
        [("a", True), ("a", False), ("b", True)], "g string, f boolean")
    out = compile_pipeline(df, "all := and(f), any := or(f) by g | sort g")
    assert rows(out) == [("a", False, True), ("b", True, True)]


def test_map_literal_pipe_disambiguation(ev):
    # |{...}| map delimiters must not be taken as stage separators
    out = compile_pipeline(
        ev, 'const ids = |{"click": 1, "view": 2}|; '
            'put code := ids[kind] | where code == 1 | cut id | sort id')
    assert rows(out) == [(0,), (2,)]


def test_const_prologue_scopes_all_stages(ev):
    out = compile_pipeline(
        ev, "const lim = 5; where amount >= lim | count()")
    assert rows(out) == [(3,)]


def test_bare_assignments_stage(ev):
    out = compile_pipeline(ev, "x := amount * 2, y := id + 1 | cut x, y")
    assert "x" in out.columns and "y" in out.columns


def test_compile_query_from_head(ev):
    out = compile_query("from events | count()", {"events": ev})
    assert rows(out) == [(5,)]
    with pytest.raises(ZedSyntaxError, match="unknown table"):
        compile_query("from nope | count()", {"events": ev})
    with pytest.raises(ZedSyntaxError, match="exactly one"):
        compile_query("count()", {"a": ev, "b": ev})


def test_unknown_stage_is_error_not_silence(ev):
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(ev, "explode tag")
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(ev, "sort -q id")
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(ev, "nope := frobnicate(id)")


def test_shaper_entrypoint_accepts_pipelines(ev):
    # apply_shaper routes through zedpipe: old single-form snippets AND
    # full pipelines both work.
    from zync_spark.streaming.from_kafka import apply_shaper

    assert apply_shaper(ev, 'kind == "view"').count() == 2
    assert apply_shaper(ev, "flag := amount > 3").columns[-1] == "flag"
    assert apply_shaper(
        ev, 'where kind == "view" | cut id, amount | sort -r amount | head 1'
    ).count() == 1


def test_plan_stays_jvm_side(ev):
    # no Python evaluation nodes in a compiled pipeline plan
    out = compile_pipeline(
        ev, 'where amount > 1 | put z := amount * 2 | total := sum(z) by kind')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_plan_is_take_ordered(ev):
    out = compile_pipeline(ev, "sort -r amount | head 2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_switch_first_match_exclusive_union(ev):
    out = compile_pipeline(
        ev,
        'switch ('
        '  case amount > 50 => bucket := "big" | cut id, bucket'
        '  case kind == "click" => bucket := "click" | cut id, bucket'
        '  default => bucket := "rest" | cut id, bucket'
        ') | sort id')
    got = dict(rows(out))
    # id 3 (amount 100) matches case 1 ONLY (first-match exclusivity),
    # ids 0/2 are clicks, 1/4 fall through
    assert got == {0: "click", 1: "rest", 2: "click", 3: "big", 4: "rest"}
    assert out.count() == ev.count()  # cases partition the input


def test_switch_without_default_drops_nonmatching(ev):
    out = compile_pipeline(
        ev, 'switch ( case kind == "view" => cut id )')
    assert out.count() == 2


def test_fork_fanout_union(ev):
    out = compile_pipeline(ev, "fork ( => count() => hi := max(amount) )")
    assert out.count() == 2
    assert set(out.columns) == {"count", "hi"}


def test_switch_null_predicate_goes_to_default(spark):
    df = spark.createDataFrame([(None,), (5,)], "x long")
    out = compile_pipeline(
        df, 'switch ( case x > 1 => tag := "gt" | cut tag'
            '         default => tag := "def" | cut tag )')
    assert sorted(r[0] for r in out.collect()) == ["def", "gt"]


def test_switch_errors(ev):
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(ev, "switch ( => cut id )")
    with pytest.raises(ZedSyntaxError):
        compile_pipeline(ev, "fork ( case kind == \"x\" => cut id )")


def test_join_must_be_adjacent_to_from_block(ev):
    # A stage between a two-source from block and `join` invalidates the
    # legs (it transforms the union, not the legs) — the join raises
    # instead of silently joining pre-stage legs and resurrecting rows the
    # user filtered out.
    tables = {"a": ev, "b": ev}
    adjacent = compile_query(
        'from ( pool a => cut id, kind pool b => cut id, amount )'
        ' | join on id=id amt := amount', tables)
    assert adjacent.count() == ev.count()
    with pytest.raises(ZedSyntaxError, match="two-source from block"):
        compile_query(
            'from ( pool a => cut id, kind pool b => cut id, amount )'
            ' | where id > 1 | join on id=id amt := amount', tables)


def test_fork_first_over_implicit_single_table(ev):
    # compile_query without a `from` head: a leading fork still gets the
    # single registered table as its implicit input
    out = compile_query(
        "fork ( => count() => hi := max(amount) )", {"events": ev})
    assert out.count() == 2
    # multi-table namespace + fork whose branches open their own `from`
    out2 = compile_query(
        "fork ( => from a | count() => from b | count() )",
        {"a": ev, "b": ev})
    assert [r[0] for r in out2.collect()] == [5, 5]


def test_ordered_collect_with_expression_sort_key(spark):
    # `sort lower(name)` is an expression key: the resolvability check must
    # recompile it (a head-identifier heuristic would see `lower` and drop
    # the declared order entirely)
    df = spark.createDataFrame(
        [("B", 1, "g"), ("a", 2, "g"), ("C", 3, "g")],
        "name string, v long, k string")
    out = compile_pipeline(df, "sort lower(name) | vs := collect(v) by k")
    assert [tuple(r) for r in out.collect()] == [("g", [2, 1, 3])]
    # and the physical global sort is still elided before the aggregate
    assert "Sort [" not in out._jdf.queryExecution().executedPlan().toString() \
        or "SortAggregate" in out._jdf.queryExecution().executedPlan().toString()


def test_ordered_collect_degrades_when_key_projected_away(spark):
    df = spark.createDataFrame(
        [("x", 1, "g"), ("y", 2, "g")], "name string, v long, k string")
    # `cut v, k` drops `name`; ordered collect degrades to plain collect
    # rather than raising an unresolvable-column analysis error
    out = compile_pipeline(df, "sort name | cut v, k | vs := collect(v) by k")
    assert sorted(out.collect()[0][1]) == [1, 2]


def test_over_lateral_subpipeline(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [10, 20])], "id long, xs array<long>")
    # plain over is unchanged
    out = compile_pipeline(df, "over xs | sum(xs)")
    assert out.collect()[0][0] == 36
    # lateral: sub-pipeline runs in element scope
    out = compile_pipeline(
        df, "over xs => ( where xs > 1 | big := xs * 10 ) | sort big")
    assert [r["big"] for r in out.collect()] == [20, 30, 100, 200]
    # with-bindings carry parent values into element scope
    out = compile_pipeline(
        df, "over xs with id = id * 100 => ( y := id + xs ) | sort y | cut y")
    assert [r["y"] for r in out.collect()] == [101, 102, 103, 210, 220]
    # `with x` sugar binds the parent field of that name
    out = compile_pipeline(
        df, "over xs with id => ( count() by id ) | sort id")
    assert [(r["id"], r["count"]) for r in out.collect()] == [(1, 3), (2, 2)]


def test_over_lateral_errors(spark):
    df = spark.createDataFrame([(1, [1])], "id long, xs array<long>")
    with pytest.raises(ZedSyntaxError, match="unterminated over"):
        compile_pipeline(df, "over xs => ( where xs > 1")


def test_assert_operator(ev):
    # passing assert: records flow through unchanged
    assert compile_pipeline(ev, "assert amount >= 0").count() == 5
    # violating assert: the query FAILS (not a silent drop)
    with pytest.raises(Exception, match="assert failed"):
        compile_pipeline(ev, "assert amount > 1").collect()
    # null predicate counts as violation
    df = ev.sparkSession.createDataFrame([(None,)], "x double")
    with pytest.raises(Exception, match="assert failed"):
        compile_pipeline(df, "assert x > 0").collect()


def test_switch_on_subject_value(ev):
    out = compile_pipeline(
        ev,
        'switch kind ('
        '  case "click" => tag := "c" | cut id, tag'
        '  case "view" => tag := "v" | cut id, tag'
        '  default => tag := "other" | cut id, tag'
        ') | sort id')
    got = dict(rows(out))
    assert got == {0: "c", 1: "v", 2: "c", 3: "other", 4: "v"}
    # subject may be an expression
    out2 = compile_pipeline(
        ev, 'switch amount > 4 ( case true => cut id default => drop id )')
    assert out2.count() == 5


def test_aggregate_where_filter_clause(ev):
    out = compile_pipeline(
        ev,
        'n_click := count() where kind == "click",'
        ' hi := sum(amount) where amount > 4,'
        ' all_n := count()')
    r = out.collect()[0]
    assert (r["n_click"], r["hi"], r["all_n"]) == (2, 112.0, 5)
    # with grouping keys
    out2 = compile_pipeline(
        ev, 'n := count() where amount > 1 by kind | sort kind')
    assert [(r["kind"], r["n"]) for r in out2.collect()] == [
        ("click", 2), ("purchase", 1), ("view", 1)]
