"""The reference's demo zed programs, run VERBATIM through zedpipe.

`demo/update.zed`, `demo/update-etl.zed`, and `demo/pending.zed` are the
reference's documented end-to-end programs (design.md:250-376). These tests
reconstruct the demo's pool contents (demo/consume-1.zson + consume-2.zson
for "raw", demo/staging-1.zson for "staging", demo/batch-1.zson for the
invoices demo) as DataFrames and assert the documented outputs:

- update.zed → the two pending records (design.md:357-361)
- update-etl.zed → {customerID:2,menuID:100,qty:1,total:5.99}
  (design.md:362-366)
- pending.zed's fork/from/anti-join skeleton over the invoices pools

Also covers the operators those programs need beyond round-1 zedpipe:
multi-source `from ( pool ... )` blocks, `anti join on k=k`, `is(<T>)`,
space-separated AND predicates, order-preserving collect after sort —
plus the `top`, `grep`, and `over` operators.
"""

import pytest

from zync_spark.zedexpr import ZedSyntaxError
from zync_spark.zedpipe import compile_pipeline, compile_query

UPDATE_ZED = """
from (
  pool raw => seqno >= 2 | sort seqno
  pool staging => not is(<cursor>) | seqno >= 2 | cut seqno | sort seqno
)
| anti join on seqno=seqno
"""

UPDATE_ETL_ZED = """
const customerIDs = |{
        "jane": 1,
        "bob": 2,
        "sarah": 3
}|
const menuIDs = |{
        "burrito": 100,
        "taco": 200,
        "chips": 300
}|
from (
  pool raw => seqno >= 2 | sort seqno
  pool staging => not is(<cursor>) | seqno >= 2 | cut seqno | sort seqno
)
| anti join on seqno=seqno
| records:=collect(this),seqno:=max(seqno),done:=or(value.done) by txn:=value.txn
| done==true
| yield {
    customerID:customerIDs[records[0].value.row.customer],
    menuID:menuIDs[records[0].value.row.product],
    qty: records[0].value.row.qty,
    total: records[0].value.row.qty * records[1].value.row.price
  }
"""

PENDING_ZED = """
fork (
  => from (
    pool "Raw" => kafka.topic=="Invoices"
    pool "Staging" => is(<done>) kafka.topic=="Invoices"
  ) | anti join on kafka.offset=kafka.offset
  => from (
    pool "Raw" => kafka.topic=="InvoiceStatus"
    pool "Staging" => is(<done>) kafka.topic=="InvoiceStatus"
  ) | anti join on kafka.offset=kafka.offset
)
"""

RAW_SCHEMA = (
    "seqno long, kafka struct<topic:string,offset:long>, "
    "value struct<txn:long,done:boolean,"
    "row:struct<customer:string,product:string,qty:long,price:double>>"
)


@pytest.fixture(scope="module")
def raw(spark):
    """demo/consume-1.zson + demo/consume-2.zson loaded into "raw"
    (heterogeneous value.row types fuse into one nullable schema)."""
    return spark.createDataFrame(
        [
            (1, ("order", 1), (10000, False, ("jane", "taco", 2, None))),
            (2, ("order", 2), (10001, False, ("bob", "burrito", 1, None))),
            (3, ("menu", 1), (10000, True, (None, "taco", None, 1.99))),
            (4, ("menu", 2), (10001, True, (None, "burrito", None, 5.99))),
        ],
        RAW_SCHEMA,
    )


@pytest.fixture(scope="module")
def staging(spark):
    """demo/staging-1.zson: one processed record (seqno 3) and the cursor
    at seqno 2 — the (=cursor) named type becomes zed_type='cursor'."""
    return spark.createDataFrame(
        [
            (3, ("order", 1), (1, 200, 2, 3.98), "data"),
            (2, None, None, "cursor"),
        ],
        "seqno long, kafka struct<topic:string,offset:long>, "
        "row struct<customerID:long,menuID:long,qty:long,total:double>, "
        "zed_type string",
    )


def test_update_zed_verbatim(raw, staging):
    """design.md:357-361: exactly the records of the pending transaction."""
    out = compile_query(UPDATE_ZED, {"raw": raw, "staging": staging})
    got = sorted(r["seqno"] for r in out.collect())
    assert got == [2, 4]
    # full records survive intact (left leg of the anti join)
    r2 = out.filter("seqno = 2").collect()[0]
    assert r2["value"]["row"]["customer"] == "bob"


def test_update_etl_zed_verbatim(raw, staging):
    """design.md:362-366: zed query -I demo/update-etl.zed
    → {customerID:2,menuID:100,qty:1,total:5.99}"""
    out = compile_query(UPDATE_ETL_ZED, {"raw": raw, "staging": staging})
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["customerID"], r["menuID"], r["qty"]) == (2, 100, 1)
    assert r["total"] == pytest.approx(5.99)


def test_update_etl_collect_order_is_partition_proof(raw, staging):
    """The yield indexes records[0]/records[1] assuming seqno order inside
    each bundle (design.md:262). The ordered collect must deliver that
    regardless of input partitioning."""
    out = compile_query(
        UPDATE_ETL_ZED,
        {"raw": raw.repartition(7), "staging": staging.repartition(3)},
    )
    r = out.collect()[0]
    assert (r["customerID"], r["menuID"], r["qty"]) == (2, 100, 1)
    assert r["total"] == pytest.approx(5.99)


@pytest.fixture(scope="module")
def invoices_raw(spark):
    """demo/batch-1.zson shape: Invoices + InvoiceStatus CDC records."""
    return spark.createDataFrame(
        [
            (("Invoices", 1), 100, "r"),
            (("Invoices", 2), 101, "r"),
            (("InvoiceStatus", 1), 80, "r"),
            (("InvoiceStatus", 2), 32, "r"),
        ],
        "kafka struct<topic:string,offset:long>, id long, op string",
    )


@pytest.fixture(scope="module")
def invoices_staging(spark):
    """Done markers: Invoices offset 1 and InvoiceStatus offset 2 are
    processed; plus a non-done data row that must NOT subtract."""
    return spark.createDataFrame(
        [
            (("Invoices", 1), "done"),
            (("InvoiceStatus", 2), "done"),
            (("Invoices", 2), "data"),
        ],
        "kafka struct<topic:string,offset:long>, zed_type string",
    )


def test_pending_zed_verbatim(invoices_raw, invoices_staging):
    """pending.zed: per-topic anti join of raw against done markers, forked
    and unioned. Only unprocessed offsets survive."""
    out = compile_query(
        PENDING_ZED, {"Raw": invoices_raw, "Staging": invoices_staging})
    got = sorted((r["kafka"]["topic"], r["kafka"]["offset"])
                 for r in out.collect())
    assert got == [("InvoiceStatus", 1), ("Invoices", 2)]


def test_from_single_pool_stage(invoices_raw, invoices_staging):
    out = compile_query(
        'from Raw | kafka.topic=="Invoices"',
        {"Raw": invoices_raw, "Staging": invoices_staging})
    assert out.count() == 2


def test_from_block_without_join_unions(spark):
    a = spark.createDataFrame([(1,)], "x long")
    b = spark.createDataFrame([(2,)], "x long")
    out = compile_query(
        "from ( pool a => pass  pool b => pass )", {"a": a, "b": b})
    assert sorted(r["x"] for r in out.collect()) == [1, 2]


def test_inner_join_with_graft_clause(spark):
    """zed join grafts right-scope expressions onto left records."""
    orders = spark.createDataFrame(
        [(1, "taco"), (2, "burrito")], "oid long, item string")
    menu = spark.createDataFrame(
        [("taco", 1.99), ("burrito", 5.99)], "name string, price double")
    out = compile_query(
        "from ( pool orders => pass  pool menu => pass )"
        "| join on item=name price:=price | sort oid",
        {"orders": orders, "menu": menu})
    assert out.columns == ["oid", "item", "price"]
    assert [r["price"] for r in out.collect()] == [1.99, 5.99]


def test_join_without_from_block_raises(spark):
    a = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ZedSyntaxError, match="two-source from block"):
        compile_query("from a | anti join on x=x", {"a": a})


def test_is_type_predicate(invoices_staging):
    out = compile_pipeline(invoices_staging, "is(<done>)")
    assert out.count() == 2
    out = compile_pipeline(invoices_staging, "not is(<done>)")
    assert out.count() == 1


def test_is_type_on_frame_without_discriminator(spark):
    """No zed_type column = no named-typed values: statically false."""
    df = spark.createDataFrame([(1,)], "x long")
    assert compile_pipeline(df, "is(<cursor>)").count() == 0
    assert compile_pipeline(df, "not is(<cursor>)").count() == 1


def test_space_separated_predicates_and(invoices_staging):
    out = compile_pipeline(
        invoices_staging, 'is(<done>) kafka.topic=="Invoices"')
    assert out.count() == 1


def test_top_operator(spark):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long")
    out = compile_pipeline(df, "top 3 v")
    assert [r["k"] for r in out.collect()] == [19, 18, 17]
    # plan: TakeOrderedAndProject, not a global Sort+Limit
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_top_then_tail(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(10)], "v long")
    out = compile_pipeline(df, "top 4 v | tail 2")
    assert sorted(r["v"] for r in out.collect()) == [6, 7]


def test_grep_one_expression(spark):
    df = spark.createDataFrame(
        [("alpha", "x"), ("beta", "y")], "a string, b string")
    assert compile_pipeline(df, 'grep "lph" a').count() == 1


def test_grep_all_string_columns(spark):
    df = spark.createDataFrame(
        [("alpha", "x", 1), ("beta", "needle", 2), ("c", "d", 3)],
        "a string, b string, n long")
    assert compile_pipeline(df, 'grep "needle"').count() == 1


def test_over_scalar_array(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "xs array<long>")
    out = compile_pipeline(df, "over xs | sum(xs)")
    assert out.collect()[0][0] == 6


def test_over_struct_array_expands(spark):
    df = spark.createDataFrame(
        [([(1, "a"), (2, "b")],)],
        "items array<struct<n:long,s:string>>")
    out = compile_pipeline(df, "over items | sort n")
    assert out.columns == ["n", "s"]
    assert [tuple(r) for r in out.collect()] == [(1, "a"), (2, "b")]


def test_ordered_collect_desc_sort(spark):
    """collect after `sort -r` delivers descending order per group."""
    df = spark.createDataFrame(
        [(1, 10), (1, 30), (1, 20), (2, 5)], "g long, v long")
    out = compile_pipeline(
        df.repartition(5), "sort -r v | vs:=collect(v) by g | sort g")
    got = [list(r["vs"]) for r in out.collect()]
    assert got == [[30, 20, 10], [5]]


def test_update_etl_plan_has_no_global_sort(raw, staging):
    """The legs' `sort seqno` exists only to order the collected bundles;
    the compiled plan must re-establish that order per group (sort_array)
    and never range-partition the whole input."""
    out = compile_query(UPDATE_ETL_ZED, {"raw": raw, "staging": staging})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_ordered_collect_degrades_when_key_projected_away(spark):
    """`sort x | cut y | collect` cannot re-establish x order (the key is
    gone) — it must fall back to plain collect, not crash."""
    df = spark.createDataFrame(
        [(1, 10, 2), (1, 30, 2), (2, 5, 2)], "g long, x long, y long")
    out = compile_pipeline(df, "sort x | cut g, y | ys:=collect(y) by g")
    got = {r["g"]: sorted(r["ys"]) for r in out.collect()}
    assert got == {1: [2, 2], 2: [2]}


def test_every_time_bucket_grouping(spark):
    """zed `count() by every(1h)` — time-bucket grouping sugar over `ts`."""
    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1, 10, m),) for m in (5, 25, 45)] + [
        (dt.datetime(2024, 1, 1, 11, 5),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = compile_pipeline(df, "count() by every(1h) | sort ts")
    got = [(r["ts"].hour, r["count"]) for r in out.collect()]
    assert got == [(10, 3), (11, 1)]


def test_any_aggregate_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "z")], "g long, s string")
    out = compile_pipeline(df.repartition(5), "v:=any(s) by g | sort g")
    assert [(r["g"], r["v"]) for r in out.collect()] == [(1, "a"), (2, "z")]


def test_collect_map_merges_with_max_wins(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (1, {"b": 9, "c": 3}), (2, {"x": 7})],
        "g long, m map<string,int>")
    out = compile_pipeline(
        df.repartition(4), "mm:=collect_map(m) by g | sort g")
    got = [(r["g"], dict(r["mm"])) for r in out.collect()]
    assert got == [(1, {"a": 1, "b": 9, "c": 3}), (2, {"x": 7})]


# ---- fragments of the reference's GENERATED ETL program, verbatim -------
# (ztests/etl-zed.yaml is `zync etl -zed invoices.yaml` output: the full
# program nests named types inside record literals ({left:done,right:done});
# the unified-schema model keeps the coerced shapes in the structs and the
# nested TAGS in the path registry (round 4) — each update branch and the
# denorm fork+join fragment run unchanged.)

UPDATE_STATUS_BRANCH = """
type done = {kafka:{topic:string,offset:int64}}
fork (
  =>
    yield {in:this}

// === user-defined ETL ===
    | out:={
        key: {
          ID: in.value.after.InvoiceID
        },
        value: {
          ID: in.value.after.InvoiceID,
          invoice_status: in.value.after.status
        }
      }

    | out.kafka:=in.kafka
    | yield out
    | kafka.topic:="NewInvoices"

  =>
    yield cast({kafka:{topic:kafka.topic,offset:kafka.offset}},done)

  )
"""

DENORM_FORK_JOIN = """
fork (
  => kafka.topic=="Invoices" | yield {left:this} | sort left.value.after.ID
  => kafka.topic=="InvoiceStatus" | yield {right:this} | sort right.value.after.InvoiceID
)
| join on left.value.after.ID=right.value.after.InvoiceID right:=right
"""


@pytest.fixture(scope="module")
def cdc(spark):
    """batch-1.zson shape: Invoices + InvoiceStatus CDC envelopes."""
    return spark.createDataFrame(
        [
            (("Invoices", 1), (100,), ("r", (100, "Alice", "taco", None, None, None))),
            (("Invoices", 2), (101,), ("r", (101, "Bob", "burrito", None, None, None))),
            (("InvoiceStatus", 1), (80,), ("u", (80, None, None, 101, "pending", None))),
            (("InvoiceStatus", 2), (32,), ("u", (32, None, None, 100, "paid", None))),
        ],
        "kafka struct<topic:string,offset:long>, key struct<ID:long>, "
        "value struct<op:string,after:struct<ID:long,customer:string,"
        "item:string,InvoiceID:long,status:string,extra:string>>",
    )


def test_update_branch_verbatim_with_named_type(cdc):
    """ztests/etl-zed.yaml:52-73: the InvoiceStatus update branch — ETL'd
    record + done marker from one fork, the marker tagged via
    cast(..., done) with a `type` prologue declaration."""
    status = cdc.filter('kafka.topic = "InvoiceStatus"')
    out = compile_pipeline(status, UPDATE_STATUS_BRANCH)
    rows = out.collect()
    data = [r for r in rows if r["zed_type"] is None]
    done = [r for r in rows if r["zed_type"] == "done"]
    assert len(data) == 2 and len(done) == 2
    by_id = {r["key"]["ID"]: r["value"]["invoice_status"] for r in data}
    assert by_id == {101: "pending", 100: "paid"}
    # rerouted topic on data rows; markers carry the ORIGINAL offsets
    assert {r["kafka"]["topic"] for r in data} == {"NewInvoices"}
    assert sorted((r["kafka"]["topic"], r["kafka"]["offset"]) for r in done) \
        == [("InvoiceStatus", 1), ("InvoiceStatus", 2)]


def test_denorm_fork_join_verbatim(cdc):
    """ztests/etl-zed.yaml:27-31: per-side yield+sort fork branches feeding
    `join on left...=right... right:=right` — the denorm graft."""
    out = compile_pipeline(cdc, DENORM_FORK_JOIN)
    rows = out.collect()
    assert len(rows) == 2
    pairs = sorted(
        (r["left"]["value"]["after"]["ID"],
         r["right"]["value"]["after"]["status"]) for r in rows)
    assert pairs == [(100, "paid"), (101, "pending")]
    # the fork's sorts are elided: no global range-partition sort executes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_is_predicate_sees_declared_types(spark):
    """is(<done>) after a `type done = ...` declaration still routes on the
    zed_type discriminator."""
    df = spark.createDataFrame(
        [(1, "done"), (2, "data")], "x long, zed_type string")
    out = compile_pipeline(
        df, "type done = {x:int64} is(<done>)")
    assert [r["x"] for r in out.collect()] == [1]


def test_full_generated_etl_program_verbatim(spark):
    """The ENTIRE `zync etl -zed invoices.yaml` output program
    (ztests/etl-zed.yaml:10-94) compiled and run unchanged over the
    batch-1 CDC rows. The NewInvoices data rows match the etl-demo ztest's
    documented records. The done-marker pair rows are
    {left:{kafka},right:{kafka}} records whose nested (=done) decorators
    ride the PATH REGISTRY (compile names_out → pool types.json,
    round-4): the struct holds the coerced shape, the registry holds the
    tags, and typeof(left)/cast(x, typeof(left)) recover them — the
    former nested-named-type degradation is closed. The remaining
    per-value-model substitution: union null-pads differing value
    shapes (a schema-union concern, not a type-tag loss)."""
    raw_txt = open("/root/reference/ztests/etl-zed.yaml").read()
    start = raw_txt.index("type done")
    prog = "\n".join(
        line[6:] if line.startswith("      ") else line
        for line in raw_txt[start:].splitlines())
    prog = prog[:prog.index("| sort kafka.offset")
                + len("| sort kafka.offset")]

    rows = [
        (("Invoices", 1), (100,), ("r", (100, "Alice", "taco", None, None), None)),
        (("Invoices", 2), (101,), ("r", (101, "Bob", "burrito", None, None), None)),
        (("InvoiceStatus", 1), (80,), ("r", (80, None, None, 101, "pending"), None)),
        (("InvoiceStatus", 2), (32,), ("r", (32, None, None, 100, "pending"), None)),
    ]
    schema = (
        "kafka struct<topic:string,offset:long>, key struct<ID:long>, "
        "value struct<op:string,"
        "after:struct<ID:long,customer:string,item:string,InvoiceID:long,status:string>,"
        "before:struct<ID:long,customer:string,item:string,InvoiceID:long,status:string>>")
    raw = spark.createDataFrame(rows, schema)
    staging = spark.createDataFrame(
        [], "kafka struct<topic:string,offset:long>, zed_type string")
    names: dict = {}
    out = compile_query(prog, {"Raw": raw, "Staging": staging},
                        names_out=names).collect()
    # the program's nested done tags (ztests/etl-zed.yaml:47-48) are
    # collected as path decorations, not dropped
    assert names == {"left": "done", "right": "done"}

    data = [r for r in out if r["key"] is not None]
    markers = [r for r in out if r["left"] is not None]
    assert len(data) == 2 and len(markers) == 2
    got = sorted(
        (r["key"]["ID"], r["value"]["customer"], r["value"]["item"],
         r["value"]["invoice_status"], r["kafka"]["topic"]) for r in data)
    # ztests/etl-demo.yaml === 1 block, modulo host-assigned output offsets
    assert got == [
        (100, "Alice", "taco", "pending", "NewInvoices"),
        (101, "Bob", "burrito", "pending", "NewInvoices"),
    ]
    pairs = sorted(
        (r["left"]["kafka"]["offset"], r["right"]["kafka"]["offset"])
        for r in markers)
    assert pairs == [(1, 2), (2, 1)]  # ID 100↔status offset 2, 101↔1


def test_count_by_typeof_this_shapes_idiom(spark, invoices_staging):
    """design.md:160: `count() by typeof(this)` — per-type record counts
    over a pool (the "shapes" report) via the zed_type discriminator."""
    out = compile_pipeline(
        invoices_staging, "count() by typeof(this) | sort typeof")
    got = {r[0]: r["count"] for r in out.collect()}
    assert got == {"data": 1, "done": 2}
    # a frame without a discriminator is all plain records
    df = spark.createDataFrame([(1,), (2,)], "x long")
    out2 = compile_pipeline(df, "count() by typeof(this)")
    assert [(r[0], r["count"]) for r in out2.collect()] == [("record", 2)]


def test_uniq_c_counts_duplicates(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "k string, v long")
    out = compile_pipeline(df, "sort k, v | uniq -c | sort k")
    assert [(r["k"], r["v"], r["count"]) for r in out.collect()] == [
        ("a", 1, 2), ("b", 2, 1)]


def test_nested_rename(spark):
    df = spark.createDataFrame(
        [((1, "x"),)], "rec struct<a:long,b:string>")
    out = compile_pipeline(df, "rename rec.z := rec.a")
    assert out.schema["rec"].dataType.names == ["b", "z"]
    r = out.collect()[0]
    assert r["rec"]["z"] == 1 and r["rec"]["b"] == "x"
    with pytest.raises(ZedSyntaxError, match="across records"):
        compile_pipeline(df, "rename top := rec.a")
