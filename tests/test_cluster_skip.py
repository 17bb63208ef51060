"""Multi-dimensional data skipping: compact(cluster_by=...) records
per-file column min/max in the manifest and scan(bounds=...) prunes whole
files against them — the secondary-predicate complement to the
offset-based commit pruning the cursor path uses."""

import random

from pyspark.sql import functions as F

from zync_spark.pool import Pool

ROW = (
    "kafka struct<topic:string,partition:bigint,offset:bigint>, "
    "zed_type string, value struct<uid:bigint,amt:double>"
)


def _mk_pool(spark, tmp_path, n=3000, commits=3):
    rng = random.Random(7)
    pool = Pool.create(spark, str(tmp_path / "p"))
    per = n // commits
    for c in range(commits):
        rows = [
            (("t", 0, c * per + i), "data", (rng.randrange(100), float(i % 50)))
            for i in range(per)
        ]
        pool.load(spark.createDataFrame(rows, ROW), f"c{c}")
    return pool


def test_cluster_by_prunes_files(spark, tmp_path):
    pool = _mk_pool(spark, tmp_path)
    pool.compact(target_rows=300, cluster_by=["value.uid"])
    all_files = pool.committed_files()
    assert len(all_files) >= 5  # enough files for skipping to mean something

    pruned = pool.committed_files(bounds={"value.uid": (10, 15)})
    assert 0 < len(pruned) < len(all_files)

    # pruned scan + row filter == full scan + row filter (skipping is
    # never allowed to change results)
    rowf = F.col("value.uid").between(10, 15)
    got = (
        pool.scan(bounds={"value.uid": (10, 15)})
        .filter(rowf)
        .select("kafka.offset")
        .collect()
    )
    exp = pool.scan().filter(rowf).select("kafka.offset").collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in exp)


def test_point_set_bounds_prune_files(spark, tmp_path):
    """A bound may be a LIST of admissible values (the IN-predicate analog
    of range skipping, round 4 — what the dedup index's bucketed probe
    uses): a file is kept iff some value falls inside its [min,max], and
    skipping never changes results."""
    pool = _mk_pool(spark, tmp_path)
    pool.compact(target_rows=300, cluster_by=["value.uid"])
    all_files = pool.committed_files()

    vals = [3, 57, 91]
    pruned = pool.committed_files(bounds={"value.uid": vals})
    assert 0 < len(pruned) < len(all_files)
    # the point set prunes at least as hard as its covering range
    assert len(pruned) <= len(
        pool.committed_files(bounds={"value.uid": (min(vals), max(vals))}))

    rowf = F.col("value.uid").isin(vals)
    got = (pool.scan(bounds={"value.uid": vals}).filter(rowf)
           .select("kafka.offset").collect())
    exp = pool.scan().filter(rowf).select("kafka.offset").collect()
    assert sorted(r[0] for r in got) == sorted(r[0] for r in exp) and got

    # a value set entirely outside the data prunes everything clustered
    none = pool.committed_files(bounds={"value.uid": [100, 999]})
    assert len(none) < len(pruned)


def test_bounds_on_unclustered_pool_is_safe_noop(spark, tmp_path):
    pool = _mk_pool(spark, tmp_path, n=300, commits=1)
    # no compact(cluster_by): no col_stats anywhere -> nothing skipped
    assert pool.committed_files(bounds={"value.uid": (0, 1)}) == pool.committed_files()


def test_open_ended_bounds_and_later_deltas(spark, tmp_path):
    pool = _mk_pool(spark, tmp_path)
    pool.compact(target_rows=300, cluster_by=["value.uid"])
    # a delta commit lands AFTER clustering: its files have no stats and
    # must always be scanned
    extra = [(("t", 0, 10_000), "data", (999, 1.0))]
    pool.load(spark.createDataFrame(extra, ROW), "late")
    got = (
        pool.scan(bounds={"value.uid": (900, None)})
        .filter(F.col("value.uid") >= 900)
        .count()
    )
    assert got == 1
    # open lower end works too
    lo_files = pool.committed_files(bounds={"value.uid": (None, 5)})
    assert len(lo_files) < len(pool.committed_files())
