"""Generic column profiler (functions/profile.py): nested structs flatten
to dotted leaves, non-orderable types degrade to counts, restriction and
approx modes work, and the whole thing is one scan."""

import pytest
from pyspark.sql import functions as F

from zync_spark.functions.profile import profile


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", {"x": 1.5, "y": "p"}, [1, 2], {"k": 1}),
        (2, "b", {"x": None, "y": "q"}, [3], {"k": 2}),
        (3, None, {"x": 2.5, "y": "q"}, None, None),
        (3, "a", None, [1, 2], {"j": 9}),
    ]
    return spark.createDataFrame(
        rows,
        "id long, s string, rec struct<x double, y string>, "
        "arr array<long>, m map<string,long>",
    )


def _by_col(res):
    return {r["col"]: r for r in res.collect()}

def test_profile_leaves_and_stats(df):
    got = _by_col(profile(df))
    assert set(got) == {"id", "s", "rec.x", "rec.y", "arr", "m"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["id"]["n_nonnull"], got["id"]["n_distinct"]) == (4, 3)
    assert (got["id"]["min_v"], got["id"]["max_v"]) == ("1", "3")
    assert (got["s"]["n_nonnull"], got["s"]["n_distinct"]) == (3, 2)
    # nested struct leaf: nulls at both the struct and the field level count
    assert (got["rec.x"]["n_nonnull"], got["rec.x"]["n_distinct"]) == (2, 2)
    assert got["rec.y"]["n_nonnull"] == 3
    # arrays are orderable: min/max lexicographic
    assert got["arr"]["n_distinct"] == 2
    assert got["arr"]["min_v"] == "[1, 2]" and got["arr"]["max_v"] == "[3]"
    # maps are not: counts only
    assert got["m"]["n_nonnull"] == 3
    assert got["m"]["n_distinct"] is None and got["m"]["min_v"] is None
    # sketch percentiles: numeric leaves only, actual elements
    assert got["id"]["p50"] in {"2", "3"}  # rank-error tolerant
    assert got["rec.x"]["p50"] in {"1.5", "2.5"}
    assert got["id"]["p95"] == "3"
    assert got["s"]["p50"] is None and got["arr"]["p95"] is None


def test_profile_restrict_and_errors(df):
    got = _by_col(profile(df, columns=["id", "rec.x"]))
    assert set(got) == {"id", "rec.x"}
    with pytest.raises(ValueError, match="no such leaf"):
        profile(df, columns=["rec"])  # struct itself is not a leaf


def test_profile_approx_mode(df):
    got = _by_col(profile(df, exact=False))
    # HLL++ on tiny cardinalities is exact in practice
    assert got["id"]["n_distinct"] == 3


def test_profile_single_scan(df):
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    # one aggregate pass: no joins, no unions of rescans
    assert "Join" not in plan and "Union" not in plan


def test_profile_matches_pinned_query(spark):
    # the generic profiler agrees with the oracle-checked q_profile on the
    # shared (orders) columns
    from zync_spark.queries import QUERIES, T

    sf = "/root/testdata/sf0.001"
    o = T(spark, sf, "orders")
    gen = _by_col(
        profile(o, columns=["o_totalprice", "o_orderpriority"])
    )
    pinned = {r["col"]: r for r in QUERIES["q_profile"](spark, sf).collect()}
    for c in ["o_totalprice", "o_orderpriority"]:
        assert gen[c]["n_nonnull"] == pinned[c]["n_nonnull"]
        assert gen[c]["n_distinct"] == pinned[c]["n_distinct"]
        assert gen[c]["min_v"] == pinned[c]["min_v"]
        assert gen[c]["max_v"] == pinned[c]["max_v"]
