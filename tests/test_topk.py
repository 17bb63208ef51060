"""grouped_topk: the sample-threshold pre-filter must be invisible in
the RESULT (exact, identical to the plain rank window) for every edge
the pre-filter reasons about — ties at the threshold, NULL values,
groups smaller than k, thresholdless groups — and visible in the PLAN
(broadcast threshold join, no full-data sort feeding the final window).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from zync_spark.functions.topk import grouped_topk, grouped_topk_window


def _rows(n, groups, tie_every=1, null_every=0):
    """Deterministic (grp, id, val) rows: values collide every
    `tie_every` ids; every `null_every`-th value is NULL."""
    out = []
    for i in range(n):
        val = float((i * 37) % (n // tie_every or 1))
        if null_every and i % null_every == 0:
            val = None
        out.append((f"g{i % groups}", i, val))
    return out


def _check(spark, data, k, **kw):
    df = spark.createDataFrame(data, "grp string, id long, val double")
    got = grouped_topk(df, "grp", "val", k, tiebreakers=["id"],
                       rank_col="rnk", **kw)
    want = grouped_topk_window(
        df, "grp", [F.col("val").desc(), F.col("id")], k, rank_col="rnk")
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
    return g


def test_matches_plain_window_heavy_groups(spark):
    rows = _check(spark, _rows(4000, groups=3), k=5)
    assert len(rows) == 15


def test_ties_at_threshold(spark):
    # tie_every=8 → every value repeats ~8×, incl. at the k-th rank
    _check(spark, _rows(4000, groups=3, tie_every=8), k=5)


def test_null_values_rank_last_and_survive(spark):
    # groups where non-null count < k force NULLs into the top-k
    data = _rows(40, groups=4, null_every=2)
    _check(spark, data, k=7)


def test_groups_smaller_than_k_kept_whole(spark):
    data = _rows(30, groups=10)  # 3 rows per group
    rows = _check(spark, data, k=5)
    assert len(rows) == 30


def test_exactness_independent_of_sample_rate(spark):
    data = _rows(2000, groups=2)
    for rate in (1, 4, 512, 10**6):  # everything sampled … nothing sampled
        _check(spark, data, k=3, sample_rate=rate)


def test_ascending(spark):
    df = spark.createDataFrame(_rows(1000, groups=3),
                               "grp string, id long, val double")
    got = grouped_topk(df, "grp", "val", 4, descending=False,
                       tiebreakers=["id"], rank_col="rnk")
    want = grouped_topk_window(
        df, "grp", [F.col("val").asc(), F.col("id")], 4, rank_col="rnk")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multi_group_cols_and_no_rank_col(spark):
    df = spark.createDataFrame(
        [(f"a{i%2}", f"b{i%3}", i, float(i % 50)) for i in range(600)],
        "g1 string, g2 string, id long, val double")
    got = grouped_topk(df, ["g1", "g2"], "val", 2, tiebreakers=["id"])
    assert got.columns == ["g1", "g2", "id", "val"]
    want = grouped_topk_window(
        df, ["g1", "g2"], [F.col("val").desc(), F.col("id")], 2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_k_must_be_positive(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, id long, val double")
    with pytest.raises(ValueError):
        grouped_topk(df, "grp", "val", 0)


def test_plan_broadcasts_thresholds_no_python(spark):
    df = spark.createDataFrame(_rows(100, groups=2),
                               "grp string, id long, val double")
    plan = grouped_topk(df, "grp", "val", 3, tiebreakers=["id"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas", plan) is None


# ---------------------------------------------------------------------------
# approx_topk (Misra-Gries)
# ---------------------------------------------------------------------------


def _zipf_rows(n_keys=200, reps=30):
    # key i appears (n_keys - i) * reps/10-ish times: deterministic skew
    rows = []
    for i in range(n_keys):
        rows.extend([(f"k{i:04d}",)] * (1 + (n_keys - i) * reps // n_keys))
    return rows


def test_approx_topk_mg_contract_holds(spark):
    """Both Misra-Gries inequalities, on every key: est <= true and
    true - est <= N/(capacity+1) (absent keys read est=0). And every key
    heavier than N/(capacity+1) must be present."""
    from zync_spark.functions.topk import approx_topk

    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "k string").repartition(7)
    cap = 16
    est = {r.key: r.est for r in approx_topk(df, "k", capacity=cap).collect()}
    true = {}
    for (k,) in rows:
        true[k] = true.get(k, 0) + 1
    n = len(rows)
    bound = n / (cap + 1)
    for k, t in true.items():
        e = est.get(k, 0)
        assert e <= t, (k, e, t)
        assert t - e <= bound, (k, e, t, bound)
        if t > bound:
            assert k in est, (k, t, bound)
    for k in est:
        assert k in true  # no fabricated keys


def test_approx_topk_partitioning_invariant_contract(spark):
    """Estimates may differ across partitionings; the CONTRACT may not."""
    from zync_spark.functions.topk import approx_topk

    rows = _zipf_rows(n_keys=50, reps=80)
    true = {}
    for (k,) in rows:
        true[k] = true.get(k, 0) + 1
    n = len(rows)
    cap = 8
    for parts in (1, 3, 13):
        df = spark.createDataFrame(rows, "k string").repartition(parts)
        est = {r.key: r.est
               for r in approx_topk(df, "k", capacity=cap).collect()}
        for k, t in true.items():
            e = est.get(k, 0)
            assert e <= t and t - e <= n / (cap + 1), (parts, k, e, t)


def test_approx_topk_capacity_validation(spark):
    from zync_spark.functions.topk import approx_topk

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        approx_topk(df, "k", capacity=0)


def test_grouped_approx_topk_per_group_contract(spark):
    """The MG inequalities hold WITHIN each group over its own stream
    length, under multiple partitionings; no fabricated (group, key)."""
    from zync_spark.functions.topk import grouped_approx_topk

    rows = []
    for g, n_keys, reps in (("a", 40, 60), ("b", 15, 25), ("c", 3, 5)):
        for i in range(n_keys):
            rows.extend([(g, f"k{i:03d}")] * (1 + (n_keys - i) * reps // n_keys))
    true, n_g = {}, {}
    for g, k in rows:
        true[(g, k)] = true.get((g, k), 0) + 1
        n_g[g] = n_g.get(g, 0) + 1
    cap = 8
    for parts in (1, 5):
        df = spark.createDataFrame(rows, "g string, k string") \
            .repartition(parts)
        est = {(r.g, r.k): r.est
               for r in grouped_approx_topk(df, "g", "k",
                                            capacity=cap).collect()}
        for (g, k), t in true.items():
            e = est.get((g, k), 0)
            bound = n_g[g] / (cap + 1)
            assert e <= t, (parts, g, k)
            assert t - e <= bound, (parts, g, k, e, t, bound)
            if t > bound:
                assert (g, k) in est
        for gk in est:
            assert gk in true


def test_grouped_approx_topk_validation(spark):
    from zync_spark.functions.topk import grouped_approx_topk

    df = spark.createDataFrame([("g", "a")], "g string, k string")
    with pytest.raises(ValueError):
        grouped_approx_topk(df, "g", "k", capacity=0)


def test_approx_topk_counts_null_keys(spark):
    """A frequent null key must satisfy the MG contract like any other
    key — pandas value_counts drops NaN by default, which would read a
    heavy null as est=0 and break the documented bound (round-6 review)."""
    from zync_spark.functions.topk import approx_topk

    rows = [(None,)] * 60 + [("a",)] * 30 + [(f"r{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    cap = 8
    out = approx_topk(df, "k", capacity=cap).collect()
    est = {r.key: r.est for r in out}
    n = len(rows)
    bound = n / (cap + 1)
    # null is the heaviest key: it must be present and within the bound
    assert None in est
    assert est[None] <= 60 and 60 - est[None] <= bound
    assert est.get("a", 0) <= 30 and 30 - est.get("a", 0) <= bound


def test_grouped_approx_topk_counts_null_keys(spark):
    from zync_spark.functions.topk import grouped_approx_topk

    rows = ([("g1", None)] * 40 + [("g1", "x")] * 10
            + [(None, "y")] * 40 + [(None, "z")] * 10)
    df = spark.createDataFrame(rows, "g string, k string").repartition(3)
    est = {(r.g, r.k): r.est
           for r in grouped_approx_topk(df, "g", "k", capacity=8).collect()}
    bound = 50 / 9  # per-group stream length 50
    assert ("g1", None) in est and 40 - est[("g1", None)] <= bound
    assert (None, "y") in est and 40 - est[(None, "y")] <= bound
