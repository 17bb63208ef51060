"""Z-order compaction (pool.zorder_column, Pool.compact(zorder=True)).

The claim under test: lexicographic range clustering on (x, y) skips
files on x but NOT on y; the Morton layout skips on BOTH. And because
the bucket function is layout-only, results are bit-identical however
the files are arranged.
"""

from __future__ import annotations

import os

import pytest

from zync_spark.pool import Pool

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<x:long,y:long>")
N = 4096


def _pool_with_grid(spark, tmp_path, name) -> Pool:
    # x and y are independent uniform dimensions (decorrelated on purpose:
    # y = bit-reversed-ish permutation of i, x = i order)
    pool = Pool.create(spark, os.path.join(str(tmp_path), name))
    rows = [(("t", 0, i), "data", (i % 64, (i * 2654435761) % 64))
            for i in range(N)]
    pool.load(spark.createDataFrame(rows, ROW), "grid")
    return pool


def _skip_fraction(pool, bounds) -> float:
    total = len(pool.committed_files())
    kept = len(pool.committed_files(bounds=bounds))
    return 1.0 - kept / total


def test_zorder_skips_on_every_dimension(spark, tmp_path):
    lex = _pool_with_grid(spark, tmp_path, "lex")
    lex.compact(target_rows=N // 16, cluster_by=["value.x", "value.y"])
    zo = _pool_with_grid(spark, tmp_path, "zo")
    zo.compact(target_rows=N // 16, cluster_by=["value.x", "value.y"],
               zorder=True)
    assert len(zo.committed_files()) >= 8

    x_narrow = {"value.x": (10, 13)}
    y_narrow = {"value.y": (10, 13)}
    # leading dim: both layouts skip
    assert _skip_fraction(lex, x_narrow) >= 0.5
    assert _skip_fraction(zo, x_narrow) >= 0.25
    # SECOND dim: lexicographic barely skips (incidental boundary
    # files only), z-order must skip substantially and strictly more
    assert _skip_fraction(lex, y_narrow) <= 0.2
    assert _skip_fraction(zo, y_narrow) >= 0.25
    assert _skip_fraction(zo, y_narrow) > _skip_fraction(lex, y_narrow)
    # both dims together prune hardest under z-order
    assert _skip_fraction(zo, {**x_narrow, **y_narrow}) >= 0.5


def test_zorder_results_identical(spark, tmp_path):
    a = _pool_with_grid(spark, tmp_path, "a")
    want = sorted(map(tuple, a.scan().collect()))
    a.compact(target_rows=N // 16, cluster_by=["value.x", "value.y"],
              zorder=True)
    assert sorted(map(tuple, a.scan().collect())) == want
    # bounded scan + residual filter == plain filter (skipping is sound)
    got = (a.scan(bounds={"value.y": (20, 30)})
           .filter("value.y between 20 and 30").count())
    assert got == sum(1 for r in want if 20 <= r[2][1] <= 30)


def test_zorder_requires_two_cluster_columns(spark, tmp_path):
    p = _pool_with_grid(spark, tmp_path, "few")
    with pytest.raises(ValueError, match="zorder"):
        p.compact(cluster_by=["value.x"], zorder=True)
    with pytest.raises(ValueError, match="zorder"):
        p.compact(zorder=True)


def test_default_compact_records_kafka_stats_for_consume_skip(spark, tmp_path):
    # no cluster_by at all: the (topic, offset) layout still lands
    # kafka.* col_stats, so consume's derived bounds file-skip
    pool = Pool.create(spark, os.path.join(str(tmp_path), "plain"))
    for t, base in (("red", 0), ("blue", 1000)):
        rows = [((t, 0, base + i), "data", (base + i, i)) for i in range(100)]
        pool.load(spark.createDataFrame(rows, ROW), t)
    pool.compact(target_rows=40)
    assert _skip_fraction(pool, {"kafka.topic": ("blue", "blue")}) > 0.0
    assert _skip_fraction(pool, {"kafka.offset": (0, 50)}) > 0.0


def test_load_time_zorder_skips_on_second_dim(spark, tmp_path):
    # the COMMIT itself lands z-ordered: fresh-commit probes skip on any
    # clustered column before any compaction runs
    pool = Pool.create(spark, os.path.join(str(tmp_path), "zload"))
    rows = [(("t", 0, i), "data", (i % 64, (i * 2654435761) % 64))
            for i in range(N)]
    pool.load(spark.createDataFrame(rows, ROW), "grid",
              cluster_by=["value.x", "value.y"], zorder=True)
    assert len(pool.committed_files()) >= 8
    assert _skip_fraction(pool, {"value.x": (10, 13)}) >= 0.25
    assert _skip_fraction(pool, {"value.y": (10, 13)}) >= 0.25
    got = (pool.scan(bounds={"value.y": (20, 30)})
           .filter("value.y between 20 and 30").count())
    assert got == sum(1 for r in rows if 20 <= r[2][1] <= 30)


def test_load_zorder_requires_two_columns(spark, tmp_path):
    pool = Pool.create(spark, os.path.join(str(tmp_path), "zone"))
    df = spark.createDataFrame([(("t", 0, 1), "data", (1, 1))], ROW)
    with pytest.raises(ValueError, match="zorder"):
        pool.load(df, "x", cluster_by=["value.x"], zorder=True)
