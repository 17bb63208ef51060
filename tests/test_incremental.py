"""Incremental materialized rollups (streaming/incremental.py): the
cursor-bounded sync → partial-append → merge-on-read → fold lifecycle.

The invariant under test everywhere: a rollup maintained incrementally
over N commits equals the one-shot aggregate over all the data, at every
point in the lifecycle (after each sync, after reruns, after fold)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from zync_spark.pool import Pool
from zync_spark.streaming import incremental as inc

ROW = StructType(
    [
        StructField(
            "kafka",
            StructType(
                [
                    StructField("topic", StringType()),
                    StructField("partition", LongType()),
                    StructField("offset", LongType()),
                ]
            ),
        ),
        StructField("zed_type", StringType()),
        StructField(
            "value",
            StructType(
                [StructField("k", StringType()), StructField("amt", DoubleType())]
            ),
        ),
    ]
)


def rows(topic, start, pairs):
    return [
        ((topic, 0, start + i), "data", (k, float(a)))
        for i, (k, a) in enumerate(pairs)
    ]


SPEC = inc.RollupSpec(
    "t",
    keys={"k": "value.k"},
    aggs=[
        ("n", "count", None),
        ("total", "sum", "CAST(value.amt AS DECIMAL(10,2))"),
        ("mn", "min", "value.amt"),
        ("mx", "max", "value.amt"),
        ("sq", "sum_sq", "CAST(value.amt AS DECIMAL(10,2))"),
    ],
)

BATCHES = [
    rows("t", 0, [("a", 1.5), ("b", 2.0), ("a", 3.0)]),
    rows("t", 3, [("b", 4.5), ("c", 0.5)]),
    rows("t", 5, [("a", 2.5), ("c", 1.0), ("b", 1.0)]),
]


def _expected(spark, batches):
    all_rows = [r for b in batches for r in b]
    df = spark.createDataFrame(all_rows, ROW)
    return {
        r["k"]: (r["n"], float(r["total"]), r["mn"], r["mx"], float(r["sq"]))
        for r in df.groupBy(F.col("value.k").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(value.amt AS DECIMAL(10,2))")).alias("total"),
            F.min("value.amt").alias("mn"),
            F.max("value.amt").alias("mx"),
            F.sum(
                F.expr("CAST(value.amt AS DECIMAL(10,2))")
                * F.expr("CAST(value.amt AS DECIMAL(10,2))")
            ).alias("sq"),
        )
        .collect()
    }


def _state(spark, dest):
    v = inc.view(dest, SPEC)
    return {
        r["k"]: (r["n"], float(r["total"]), r["mn"], r["mx"], float(r["sq"]))
        for r in v.collect()
    }


@pytest.fixture()
def lakes(spark, tmp_path):
    return (
        Pool.create(spark, str(tmp_path / "src")),
        Pool.create(spark, str(tmp_path / "dest")),
    )


def test_incremental_equals_full_recompute(spark, lakes):
    src, dest = lakes
    for i, b in enumerate(BATCHES, 1):
        src.load(spark.createDataFrame(b, ROW), f"b{i}")
        assert inc.sync(src, dest, SPEC, ["t"]) > 0
        assert _state(spark, dest) == _expected(spark, BATCHES[:i])


def test_rerun_is_noop_and_cursor_advances(spark, lakes):
    src, dest = lakes
    src.load(spark.createDataFrame(BATCHES[0], ROW), "b1")
    inc.sync(src, dest, SPEC, ["t"])
    assert dest.stored_cursors() == {"rollup:t|t#0": 3}
    assert inc.sync(src, dest, SPEC, ["t"]) == 0  # no new data: no commit
    assert _state(spark, dest) == _expected(spark, BATCHES[:1])


def test_multi_commit_delta_in_one_sync(spark, lakes):
    # source advances twice between maintenance passes; one sync absorbs both
    src, dest = lakes
    src.load(spark.createDataFrame(BATCHES[0], ROW), "b1")
    src.load(spark.createDataFrame(BATCHES[1], ROW), "b2")
    inc.sync(src, dest, SPEC, ["t"])
    assert _state(spark, dest) == _expected(spark, BATCHES[:2])
    assert dest.stored_cursors() == {"rollup:t|t#0": 5}


def test_fold_preserves_view_and_bounds_state(spark, lakes):
    src, dest = lakes
    for i, b in enumerate(BATCHES, 1):
        src.load(spark.createDataFrame(b, ROW), f"b{i}")
        inc.sync(src, dest, SPEC, ["t"])
    before = _state(spark, dest)
    inc.fold(dest, SPEC)
    assert _state(spark, dest) == before
    assert dest.commits_since_base() == 0
    # partials collapsed to one row per key
    partials = dest.scan().filter(F.col("zed_type") == "partial")
    assert partials.count() == len(before)
    # cursor survives the fold: the next sync is still a no-op
    assert inc.sync(src, dest, SPEC, ["t"]) == 0
    # and new data after a fold keeps accruing correctly
    extra = rows("t", 8, [("a", 9.0), ("d", 7.0)])
    src.load(spark.createDataFrame(extra, ROW), "b4")
    inc.sync(src, dest, SPEC, ["t"])
    assert _state(spark, dest) == _expected(spark, BATCHES + [extra])


def test_variance_derivable_from_partials(spark, lakes):
    # sum_sq + sum + count ⇒ population variance at view time
    src, dest = lakes
    for b in BATCHES:
        src.load(spark.createDataFrame(b, ROW), "b")
        inc.sync(src, dest, SPEC, ["t"])
    v = inc.view(dest, SPEC).withColumn(
        "var",
        F.col("sq").cast("double") / F.col("n")
        - (F.col("total").cast("double") / F.col("n")) ** 2,
    )
    got = {r["k"]: r["var"] for r in v.collect()}
    exp = {
        r["k"]: r["v"]
        for r in spark.createDataFrame([x for b in BATCHES for x in b], ROW)
        .groupBy(F.col("value.k").alias("k"))
        .agg(F.var_pop("value.amt").alias("v"))
        .collect()
    }
    for k in exp:
        assert got[k] == pytest.approx(exp[k])


def test_done_markers_pass_through_fold(spark, lakes):
    # a summary pool can interleave other record types; fold leaves them be
    src, dest = lakes
    src.load(spark.createDataFrame(BATCHES[0], ROW), "b1")
    inc.sync(src, dest, SPEC, ["t"])
    other = spark.createDataFrame(
        [(("done-topic", 0, 7), "done", None)], ROW
    )
    dest.load(other, "marker")
    before = _state(spark, dest)
    inc.fold(dest, SPEC)
    assert _state(spark, dest) == before
    kept = dest.scan().filter(F.col("zed_type") == "done").collect()
    assert len(kept) == 1 and kept[0]["kafka"]["offset"] == 7


def test_multi_partition_lagging_partition_not_dropped(spark, lakes):
    # Kafka offsets are per-partition sequences: partition 1's offsets 9-10
    # arriving AFTER partition 0 reached offset 10 must still be absorbed
    src, dest = lakes
    b1 = [(("t", 0, i), "data", ("a", 1.0)) for i in range(11)] + [
        (("t", 1, i), "data", ("b", 1.0)) for i in range(9)
    ]
    src.load(spark.createDataFrame(b1, ROW), "b1")
    inc.sync(src, dest, SPEC, ["t"])
    b2 = [(("t", 1, 9), "data", ("b", 1.0)), (("t", 1, 10), "data", ("b", 1.0))]
    src.load(spark.createDataFrame(b2, ROW), "b2")
    inc.sync(src, dest, SPEC, ["t"])
    got = {r["k"]: r["n"] for r in inc.view(dest, SPEC).collect()}
    assert got == {"a": 11, "b": 11}
    assert dest.stored_cursors() == {"rollup:t|t#0": 11, "rollup:t|t#1": 11}
    # a brand-new partition appearing later starts at offset 0
    b3 = [(("t", 2, 0), "data", ("c", 1.0))]
    src.load(spark.createDataFrame(b3, ROW), "b3")
    inc.sync(src, dest, SPEC, ["t"])
    got = {r["k"]: r["n"] for r in inc.view(dest, SPEC).collect()}
    assert got["c"] == 1


def test_two_specs_share_dest_without_clobbering(spark, lakes):
    src, dest = lakes
    other = inc.RollupSpec(
        "amts", keys={"k": "value.k"}, aggs=[("mx", "max", "value.amt")]
    )
    src.load(spark.createDataFrame(BATCHES[0], ROW), "b1")
    inc.sync(src, dest, SPEC, ["t"])
    # second spec syncs AFTER the first advanced its own cursor: it must
    # still see everything from offset 0
    assert inc.sync(src, dest, other, ["t"]) > 0
    got = {r["k"]: r["mx"] for r in inc.view(dest, other).collect()}
    assert got == {"a": 3.0, "b": 2.0}
    # and the first spec's view is untouched
    assert _state(spark, dest) == _expected(spark, BATCHES[:1])


def test_concurrent_syncs_cannot_double_count(spark, lakes, monkeypatch):
    # two racers read the same cursor; the loser's publish must abort
    # (compare-and-set), not append a second copy of the same partials
    from zync_spark.pool import ConcurrentWriteError, Pool

    src, dest = lakes
    src.load(spark.createDataFrame(BATCHES[0], ROW), "b1")

    real_load = Pool.load
    raced = {"done": False}

    def interleaved(self, df, message="", cursors=None, occ_token=None):
        if not raced["done"]:
            raced["done"] = True
            # racer B lands its commit between A's cursor read and publish
            real_load(self, df, message + " (racer B)", cursors=cursors)
        return real_load(self, df, message, cursors=cursors, occ_token=occ_token)

    monkeypatch.setattr(Pool, "load", interleaved)
    with pytest.raises(ConcurrentWriteError):
        inc.sync(src, dest, SPEC, ["t"])
    monkeypatch.setattr(Pool, "load", real_load)
    # racer B's commit stands alone; state is correct, not doubled
    assert _state(spark, dest) == _expected(spark, BATCHES[:1])
    assert inc.sync(src, dest, SPEC, ["t"]) == 0  # loser's rerun: no-op


# -- merge-algebra property tests -------------------------------------------
# The whole incremental design rests on partial_agg/merge_agg forming a
# commutative monoid: any split of the data into batches, in any order,
# must merge to the state a one-shot aggregate produces. Hypothesis
# drives random data + random splits through the algebra IN MEMORY (no
# pools — the pool lifecycle is covered above; this isolates the math).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: E402

_PROPS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=-10_000, max_value=10_000),
    ),
    min_size=1,
    max_size=40,
)


def _env_rows(rows):
    return [
        (("t", 0, i), "data", (k, cents / 100.0)) for i, (k, cents) in enumerate(rows)
    ]


def _collect(df):
    out = {}
    for r in df.collect():
        out[r["k"]] = (
            r["n"],
            None if r["total"] is None else float(r["total"]),
            r["mn"],
            r["mx"],
            None if r["sq"] is None else float(r["sq"]),
        )
    return out


@_PROPS
@given(rows=_rows, cut=st.integers(min_value=0, max_value=40))
def test_split_merge_equals_one_shot(spark, rows, cut):
    cut = min(cut, len(rows))
    whole = spark.createDataFrame(_env_rows(rows), ROW)
    one_shot = _collect(SPEC.merge_agg(SPEC.partial_agg(whole)))
    parts = [rows[:cut], rows[cut:]]
    partials = [
        SPEC.partial_agg(spark.createDataFrame(_env_rows(p), ROW))
        for p in parts
        if p
    ]
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    assert _collect(SPEC.merge_agg(merged)) == one_shot


@_PROPS
@given(rows=_rows)
def test_merge_is_idempotent_under_refold(spark, rows):
    # folding partials any number of times never changes the state
    # (fold() safety): merge(merge(p)) == merge(p)
    p = SPEC.partial_agg(spark.createDataFrame(_env_rows(rows), ROW))
    once = SPEC.merge_agg(p)
    twice = SPEC.merge_agg(once)
    assert _collect(once) == _collect(twice)
