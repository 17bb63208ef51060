"""Pool: atomic commits, schema widening, offset resume queries."""

import json
import os

import pytest

from tests.fixtures_invoices import BATCH_1, BATCH_2, ROW_SCHEMA

from zync_spark.pool import Pool, PoolKeyError


def test_create_open_and_key_check(spark, tmp_path):
    p = Pool.create(spark, str(tmp_path / "p"))
    assert Pool.open(spark, str(tmp_path / "p")) is not None
    # corrupt the key config → open must refuse (etl/pool.go:37-40 analog)
    with open(tmp_path / "p" / "pool.json", "w") as f:
        json.dump({"key": "ts", "order": "asc"}, f)
    with pytest.raises(PoolKeyError):
        Pool.open(spark, str(tmp_path / "p"))


def test_load_scan_roundtrip(spark, tmp_path):
    p = Pool.create(spark, str(tmp_path / "p"))
    assert p.scan() is None
    assert p.load(spark.createDataFrame(BATCH_1, ROW_SCHEMA)) == 4
    assert p.scan().count() == 4
    assert p.load(spark.createDataFrame(BATCH_2, ROW_SCHEMA)) == 3
    assert p.scan().count() == 7


def test_empty_load_commits_nothing(spark, tmp_path):
    p = Pool.create(spark, str(tmp_path / "p"))
    empty = spark.createDataFrame([], ROW_SCHEMA)
    assert p.load(empty) == 0
    assert p.commits() == []


def test_uncommitted_files_invisible(spark, tmp_path):
    """Data files without a commit manifest must not be readable state."""
    p = Pool.create(spark, str(tmp_path / "p"))
    p.load(spark.createDataFrame(BATCH_1, ROW_SCHEMA))
    # orphan a data file (simulates a crash between write and manifest)
    spark.createDataFrame(BATCH_2, ROW_SCHEMA).write.parquet(
        str(tmp_path / "p" / "data" / "orphan")
    )
    assert p.scan().count() == 4


def test_offset_queries(spark, tmp_path):
    p = Pool.create(spark, str(tmp_path / "p"))
    assert p.next_consumer_offset("Invoices") == 0
    assert p.next_producer_offsets() == {}
    p.load(spark.createDataFrame(BATCH_1 + BATCH_2, ROW_SCHEMA))
    assert p.next_consumer_offset("Invoices") == 5      # max offset 4 + 1
    assert p.next_consumer_offset("InvoiceStatus") == 4  # max offset 3 + 1
    assert p.next_producer_offsets() == {"Invoices": 5, "InvoiceStatus": 4}


def test_manifest_stats_prune_commits(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from zync_spark.pool import Pool

    pool = Pool.create(spark, os.path.join(tmp_path, "P"))

    def env_batch(topic, offsets):
        return spark.createDataFrame(
            [((topic, 0, o), "data") for o in offsets],
            "kafka struct<topic:string,partition:long,offset:long>, zed_type string",
        )

    pool.load(env_batch("A", [0, 1, 2]))
    pool.load(env_batch("A", [3, 4]))
    pool.load(env_batch("B", [0, 1]))

    all_files = pool.committed_files()
    # bound A>=3: commit 1 (A max 2) and commit 3 (no A) prune away
    pruned = pool.committed_files(lower_bounds={"A": 3})
    assert set(pruned) < set(all_files)
    rows = pool.scan(lower_bounds={"A": 3}).filter(
        (F.col("kafka.topic") == "A") & (F.col("kafka.offset") >= 3)
    ).collect()
    assert sorted(r["kafka"]["offset"] for r in rows) == [3, 4]
    # bound below everything keeps all commits with that topic
    assert len(pool.committed_files(lower_bounds={"A": 0})) == len(
        pool.committed_files(lower_bounds={"A": 2})
    )


def test_stored_cursors_latest_wins(spark, tmp_path):
    import os

    from zync_spark.pool import Pool

    pool = Pool.create(spark, os.path.join(tmp_path, "C"))
    env = spark.createDataFrame(
        [(("T", 0, 0), "done")],
        "kafka struct<topic:string,partition:long,offset:long>, zed_type string",
    )
    pool.load(env, "c1", cursors={"T": 3, "U": 2})
    pool.load(env, "c2", cursors={"T": 7})
    assert pool.stored_cursors() == {"T": 7, "U": 2}


def test_schema_widening_across_commits(spark, tmp_path):
    """The pool is heterogeneously typed (SURVEY §1.2): later commits may
    carry wider value schemas; scan() fuses them with null-padding."""
    import os

    from zync_spark.pool import Pool

    pool = Pool.create(spark, os.path.join(tmp_path, "W"))
    pool.load(spark.createDataFrame(
        [((("T"), 0, 0), (1,), "data")],
        "kafka struct<topic:string,partition:long,offset:long>, "
        "value struct<a:long>, zed_type string",
    ))
    pool.load(spark.createDataFrame(
        [((("T"), 0, 1), (2, "x"), "data")],
        "kafka struct<topic:string,partition:long,offset:long>, "
        "value struct<a:long,b:string>, zed_type string",
    ))
    rows = {r["kafka"]["offset"]: r["value"].asDict() for r in pool.scan().collect()}
    assert rows == {0: {"a": 1, "b": None}, 1: {"a": 2, "b": "x"}}


def test_compact_time_travel_and_vacuum(spark, tmp_path):
    """compact() collapses many small commits into a base manifest whose
    files are offset-clustered; scan(at=) time-travels; vacuum() reclaims
    superseded files (and only those)."""
    import os

    from pyspark.sql import functions as F

    from zync_spark.pool import Pool

    pool = Pool.create(spark, os.path.join(tmp_path, "K"))

    def env_batch(topic, offsets):
        return spark.createDataFrame(
            [((topic, 0, o), "data") for o in offsets],
            "kafka struct<topic:string,partition:long,offset:long>, zed_type string",
        )

    pool.load(env_batch("A", [0, 1, 2]), cursors={"A": 2})
    pool.load(env_batch("A", [3, 4]))
    pool.load(env_batch("B", [0, 1]), cursors={"B": 1})
    before = sorted(
        (r["kafka"]["topic"], r["kafka"]["offset"]) for r in pool.scan().collect()
    )
    n_small = len(pool.committed_files())

    assert pool.compact() == 7
    # live view identical, through fewer files
    after = sorted(
        (r["kafka"]["topic"], r["kafka"]["offset"]) for r in pool.scan().collect()
    )
    assert after == before
    assert len(pool.committed_files()) < n_small
    # merged stats keep bounded-scan pruning alive on the base manifest
    assert pool.scan(lower_bounds={"A": 3}).filter(
        (F.col("kafka.topic") == "A") & (F.col("kafka.offset") >= 3)
    ).count() == 2
    # cursors carried across the checkpoint
    assert pool.stored_cursors() == {"A": 2, "B": 1}

    # time travel: as-of commit 0 sees only the first batch
    assert pool.scan(at=0).count() == 3
    # timestamp-based time travel: resolve a wall-clock instant to the
    # last commit at or before it
    with open(os.path.join(pool.path, "_commits", "000000.json")) as f:
        t0 = json.load(f)["ts"]
    assert pool.seq_at_ts(t0) == 0
    assert pool.scan(at_ts=t0).count() == 3
    assert pool.scan(at_ts=t0 - 1.0) is None        # before any commit
    assert pool.seq_at_ts(float("inf")) == len(pool.commits()) - 1
    with pytest.raises(ValueError, match="not both"):
        pool.scan(at=0, at_ts=t0)
    # appends after compaction layer on top of the base
    pool.load(env_batch("B", [2]))
    assert pool.scan().count() == 8
    assert pool.next_producer_offsets() == {"A": 5, "B": 3}

    # vacuum removes exactly the superseded small files
    live = set(pool.committed_files())
    assert pool.vacuum(retention_s=0) == n_small
    assert set(pool.committed_files()) == live
    assert pool.scan().count() == 8
    # rerun is a no-op
    assert pool.vacuum(retention_s=0) == 0


def test_compact_materializes_schema_fuse(spark, tmp_path):
    """Heterogeneous commit schemas become one wide schema in the base
    files (readers stop paying mergeSchema)."""
    import os

    from zync_spark.pool import Pool

    pool = Pool.create(spark, os.path.join(tmp_path, "F"))
    pool.load(spark.createDataFrame(
        [(("T", 0, 0), (1,), "data")],
        "kafka struct<topic:string,partition:long,offset:long>, "
        "value struct<a:long>, zed_type string",
    ))
    pool.load(spark.createDataFrame(
        [(("T", 0, 1), (2, "x"), "data")],
        "kafka struct<topic:string,partition:long,offset:long>, "
        "value struct<a:long,b:string>, zed_type string",
    ))
    pool.compact()
    pool.vacuum(retention_s=0)
    # every live file now carries the fused schema on its own
    for f in pool.committed_files():
        df = spark.read.parquet(f)  # no mergeSchema
        assert "b" in df.schema["value"].dataType.fieldNames()
    rows = {r["kafka"]["offset"]: r["value"].asDict() for r in pool.scan().collect()}
    assert rows == {0: {"a": 1, "b": None}, 1: {"a": 2, "b": "x"}}


def test_concurrent_commit_protocol(spark, tmp_path):
    """Optimistic concurrency: a manifest seq collision makes load() retry
    at the next seq and makes compact() abort — never silent overwrite."""
    import json as _json
    import os

    import pytest

    from zync_spark.pool import ConcurrentWriteError, Pool, _atomic_create_json

    pool = Pool.create(spark, os.path.join(tmp_path, "X"))

    def env_batch(offsets):
        return spark.createDataFrame(
            [(("T", 0, o), "data") for o in offsets],
            "kafka struct<topic:string,partition:long,offset:long>, zed_type string",
        )

    pool.load(env_batch([0, 1]))
    # another writer claims seq 1 out from under us
    foreign = os.path.join(pool._commit_dir(), "000001.json")
    _atomic_create_json(foreign, {"files": [], "message": "foreign", "rows": 0,
                                  "stats": {}})
    # load() must NOT overwrite seq 1: it lands at seq 2
    pool.load(env_batch([2, 3]))
    assert pool.commits() == ["000000.json", "000001.json", "000002.json"]
    with open(foreign) as f:
        assert _json.load(f)["message"] == "foreign"  # untouched
    assert pool.scan().count() == 4

    # exclusive create itself refuses to replace an existing manifest
    with pytest.raises(FileExistsError):
        _atomic_create_json(foreign, {"files": []})

    # compact: a commit landing after the snapshot aborts the publish.
    # Simulate the race by appending a commit right after compact() takes
    # its snapshot (the first commits() call inside compact).
    real_commits = Pool.commits
    race = {"armed": True}

    def racing_commits(self):
        out = real_commits(self)
        if race["armed"]:
            race["armed"] = False  # disarm BEFORE the racing load recurses
            racer = Pool.open(spark, self.path)
            racer.load(env_batch([4]))
        return out

    try:
        Pool.commits = racing_commits
        with pytest.raises(ConcurrentWriteError):
            pool.compact()
    finally:
        Pool.commits = real_commits
    # nothing lost: the racer's row is live, no base manifest was published
    assert pool.scan().count() == 5
    # a clean re-run then succeeds and keeps every row
    assert pool.compact() == 5
    assert pool.scan().count() == 5
    assert pool.vacuum(retention_s=0) > 0
    assert pool.scan().count() == 5


def test_key_compaction_log_semantics(spark, tmp_path):
    """keep_latest_by_key: Kafka log-compaction over the pool — latest data
    record per (topic, key) survives, markers are never dropped."""
    import os

    from pyspark.sql import functions as F

    from zync_spark.pool import Pool

    pool = Pool.create(spark, os.path.join(tmp_path, "LC"))
    schema = (
        "kafka struct<topic:string,partition:long,offset:long>, "
        "key struct<ID:long>, value struct<name:string>, zed_type string"
    )
    pool.load(spark.createDataFrame(
        [(("T", 0, 0), (1,), ("a",), "data"),
         (("T", 0, 1), (2,), ("b",), "data")], schema))
    pool.load(spark.createDataFrame(
        [(("T", 0, 2), (1,), ("a2",), "data"),     # update key 1
         (("T", 0, 3), (None,), (None,), "done"),  # marker must survive
         (("U", 0, 0), (1,), ("u1",), "data")], schema))  # other topic's key 1

    assert pool.compact(keep_latest_by_key=True) == 4
    rows = pool.scan().orderBy("kafka.topic", "kafka.offset").collect()
    data = [(r["kafka"]["topic"], r["kafka"]["offset"], r["key"]["ID"],
             r["value"]["name"]) for r in rows if r["zed_type"] == "data"]
    # key 1 on topic T keeps only offset 2; topic U's key 1 is independent
    assert data == [("T", 1, 2, "b"), ("T", 2, 1, "a2"), ("U", 0, 1, "u1")]
    assert [r["zed_type"] for r in rows].count("done") == 1
    # resume points still reflect the original high-water marks (the
    # latest record per key is by definition never dropped, and the
    # marker row at offset 3 survives)
    assert pool.next_consumer_offset("T") == 4


def test_concurrent_loads_thread_stress(spark, tmp_path):
    """Real-thread OCC stress: N writers race load() against one pool;
    every commit must survive (exclusive manifest publish + seq retry),
    no lost updates, rows of every writer present exactly once."""
    import threading

    from pyspark.sql import functions as F

    from zync_spark.pool import Pool

    pool = Pool.create(spark, str(tmp_path / "stress"))
    N = 6
    errs = []

    def writer(i):
        try:
            df = spark.range(i * 10, i * 10 + 10).select(
                F.struct(
                    F.lit("t").alias("topic"),
                    F.lit(0).cast("long").alias("partition"),
                    F.col("id").alias("offset"),
                ).alias("kafka"),
                F.col("id").alias("key"),
                F.lit(f"w{i}").alias("value"),
                F.lit("data").alias("zed_type"),
            )
            assert pool.load(df, f"writer-{i}") == 10
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append((i, e))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert len(pool.commits()) == N
    rows = pool.scan().collect()
    assert len(rows) == N * 10
    # every writer's rows present exactly once
    by_writer = {}
    for r in rows:
        by_writer[r["value"]] = by_writer.get(r["value"], 0) + 1
    assert by_writer == {f"w{i}": 10 for i in range(N)}


def test_commits_numeric_order_past_a_million(spark, tmp_path):
    # lexicographic filename order breaks at seq 1,000,000 — commits()
    # must sort numerically
    p = Pool.create(spark, str(tmp_path / "big"))
    cdir = os.path.join(str(tmp_path / "big"), "_commits")
    for seq in (999999, 1000000):
        with open(os.path.join(cdir, f"{seq}.json"), "w") as f:
            json.dump({"files": [], "rows": 0, "stats": None}, f)
    assert [int(c.split(".")[0]) for c in p.commits()] == [999999, 1000000]


def test_vacuum_retention_protects_inflight_writers(spark, tmp_path):
    # an unreferenced-but-fresh data dir may belong to a concurrent
    # writer that has not published its manifest yet
    p = Pool.create(spark, str(tmp_path / "v"))
    p.load(spark.createDataFrame(BATCH_1, ROW_SCHEMA))
    inflight = os.path.join(str(tmp_path / "v"), "data", "inflight")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("x")
    assert p.vacuum() == 0              # default retention keeps it
    assert os.path.exists(inflight)
    assert p.vacuum(retention_s=0) == 1  # explicit 0 reclaims
    assert not os.path.exists(inflight)


def test_keep_latest_preserves_null_key_and_null_type_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    p = Pool.create(spark, str(tmp_path / "kl"))
    # two updates for key 7, one NULL-key data row, one NULL-key second row
    rows = [
        (("t", 0, 0), (7,), None, "data"),
        (("t", 0, 1), (7,), None, "data"),
        (("t", 0, 2), None, None, "data"),
        (("t", 0, 3), None, None, "data"),
    ]
    schema = (
        "kafka struct<topic:string,partition:bigint,offset:bigint>, "
        "key struct<ID:bigint>, value struct<name:string>, zed_type string"
    )
    p.load(spark.createDataFrame(rows, schema))
    # plus a commit from a frame WITHOUT zed_type (schema-widened to null)
    p.load(spark.createDataFrame(
        [(("t", 0, 9), (1,), None)],
        "kafka struct<topic:string,partition:bigint,offset:bigint>, "
        "key struct<ID:bigint>, value struct<name:string>",
    ))
    p.compact(keep_latest_by_key=True)
    got = p.scan().select(F.col("kafka.offset").alias("o")).orderBy("o").collect()
    # key 7 deduped to its latest (offset 1); BOTH null-key rows survive;
    # the null-zed_type row survives
    assert [r["o"] for r in got] == [1, 2, 3, 9]


def test_empty_lower_bounds_means_no_pruning(spark, tmp_path):
    p = Pool.create(spark, str(tmp_path / "eb"))
    p.load(spark.createDataFrame(BATCH_1, ROW_SCHEMA))
    assert p.committed_files(lower_bounds={}) == p.committed_files()
    assert p.scan(lower_bounds={}).count() == len(BATCH_1)


def test_create_rejects_bad_key(spark, tmp_path):
    with pytest.raises(PoolKeyError):
        Pool.create(spark, str(tmp_path / "bad"), key="ts")


def test_resume_served_from_manifest_stats(spark, tmp_path):
    # when every live manifest has per-partition stats, resume queries
    # fold manifests instead of scanning — verify by corrupting the data
    # files after commit: a scan would fail, the manifest path cannot
    import shutil as _sh

    p = Pool.create(spark, str(tmp_path / "ms"))
    p.load(spark.createDataFrame(BATCH_1, ROW_SCHEMA))
    expect = p.next_consumer_offset("Invoices")
    _sh.rmtree(os.path.join(str(tmp_path / "ms"), "data"))
    assert p.next_consumer_offset("Invoices") == expect


def test_may_overlap_point_set_properties():
    """Pure-logic properties of the file-skip test: the point-set form
    keeps a file iff some value lies in [min,max]; it never keeps more
    files than its covering range; missing stats always keep."""
    from hypothesis import given, strategies as st

    from zync_spark.pool import _may_overlap

    @given(
        st.lists(st.integers(-50, 50), min_size=1, max_size=20),
        st.integers(-50, 50), st.integers(0, 40),
    )
    def check(vals, lo, span):
        hi = lo + span
        stats = {"c": [lo, hi]}
        keep_set = _may_overlap(stats, {"c": vals})
        assert keep_set == any(lo <= v <= hi for v in vals)
        # point set is never more permissive than its covering range
        keep_range = _may_overlap(stats, {"c": (min(vals), max(vals))})
        assert not keep_set or keep_range
        # missing stats always keep
        assert _may_overlap(None, {"c": vals})
        assert _may_overlap({"other": [0, 1]}, {"c": vals})

    check()


def test_losing_occ_writer_does_not_touch_type_registry(spark, tmp_path):
    """Round-4 review: the types.json merge must ride the OCC outcome —
    a load that loses the compare-and-set publishes nothing, so it must
    mutate nothing (the sidecar is written only AFTER the manifest claim
    succeeds)."""
    import pytest

    from zync_spark.pool import ConcurrentWriteError

    pool = Pool.create(spark, str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(("t", 0, 0), "x")],
        "kafka struct<topic:string,partition:long,offset:long>, v string")
    pool.load(df, "first", type_names={"v": "name_t"})
    assert pool.type_names() == {"v": "name_t"}
    # seq 0 is taken: an occ_token=0 load loses the CAS
    with pytest.raises(ConcurrentWriteError):
        pool.load(df, "loser", occ_token=0, type_names={"v": "EVIL"})
    assert pool.type_names() == {"v": "name_t"}  # registry untouched
    # the winning occ path merges after its publish
    pool.load(df, "winner", occ_token=1, type_names={"w": "other_t"})
    assert pool.type_names() == {"v": "name_t", "w": "other_t"}


def test_concurrent_type_name_merges_are_lossless(spark, tmp_path):
    """Two concurrent set_type_names callers must both land (the
    read-merge-write is lock-guarded; an unlocked interleave would drop
    one writer's paths — round-4 review)."""
    import threading

    pool = Pool.create(spark, str(tmp_path / "p"))
    errs = []

    def merge(i):
        try:
            for j in range(20):
                pool.set_type_names({f"p{i}.{j}": f"t{i}"})
        except Exception as e:  # pragma: no cover - failure diagnostics
            errs.append(e)

    threads = [threading.Thread(target=merge, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    got = pool.type_names()
    assert len(got) == 80  # every writer's every path survived


def test_scan_packs_small_files_and_keeps_pushdown(spark, tmp_path):
    """Round-5 ask #2: small-file scan sizing lives in the ENGINE.
    Pool.scan over a many-small-commit pool coalesces to the packing
    bound (data-sized tasks, not one dispatch per file), filters still
    reach the parquet scan through the Coalesce, and the packing math
    reproduces Spark's own partitioning at scale (no-op regime)."""
    from pyspark.sql import functions as F

    from zync_spark.pool import _pack_target, read_packed

    pool = Pool.create(spark, str(tmp_path / "p"))
    for c in range(12):  # 12 one-file commits — streaming-ingest shape
        rows = [(("t", 0, c * 50 + i), "data", i) for i in range(50)]
        pool.load(spark.createDataFrame(
            rows, "kafka struct<topic:string,partition:long,offset:long>,"
                  " zed_type string, v long"), f"c{c}")
    files = pool.committed_files()
    assert len(files) == 12
    df = pool.scan()
    assert df.rdd.getNumPartitions() < len(files)
    q = df.filter(F.col("v") == 3).select("v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(v), EqualTo(v,3)]" in plan
    assert q.count() == 12
    # packing math: small inputs pack to quarter-of-cores granularity
    # (fewer, data-sized dispatches); at-scale inputs match Spark's own
    # maxPartitionBytes partitioning exactly (the coalesce is a no-op)
    cores = max(1, spark.sparkContext.defaultParallelism // 4)
    padded16 = (20 << 20) + 16 * (4 << 20)
    want16 = -(-padded16 // max(4 << 20, padded16 // cores))
    assert _pack_target(spark, 20 << 20, 16) == want16 < 16
    big = _pack_target(spark, 100 << 40, 1_000_000)
    padded = (100 << 40) + 1_000_000 * (4 << 20)
    assert big == -(-padded // (128 << 20))  # == Spark's own task count
    # single file: read_packed never inserts a Coalesce
    one = read_packed(spark, files[:1])
    assert "Coalesce" not in one._jdf.queryExecution().executedPlan().toString()


def test_clustered_compact_min_fanout(spark, tmp_path):
    """A clustered base must never collapse to ONE file: file-granularity
    skipping needs several key-space-disjoint files, and one file is one
    row group — a single-task scan for every later bounded probe
    (round 9, measured on the 200k-vector embdedup resize where
    post-rebuild passes got SLOWER than pre-rebuild). compact(cluster_by)
    floors its fan-out at 8 range files, the same rule load() applies to
    clustered delta commits."""
    from zync_spark.pool import Pool

    pool = Pool.create(spark, str(tmp_path / "P"))
    rows = [(("t", 0, i), "data", "k%02x" % (i % 16)) for i in range(640)]
    pool.load(spark.createDataFrame(
        rows, "kafka struct<topic:string,partition:long,offset:long>, "
              "zed_type string, ckey string"), "fill")
    assert pool.compact(cluster_by=["ckey"]) == 640
    files = pool.committed_files()
    assert len(files) >= 8
    # the range layout still skips: a one-bucket probe reads a strict
    # subset of the base's files
    probe = pool.committed_files(bounds={"ckey": ["k00"]})
    assert 0 < len(probe) < len(files)
    # an UNclustered compaction keeps the few-large-files contract
    pool2 = Pool.create(spark, str(tmp_path / "P2"))
    pool2.load(spark.createDataFrame(
        rows, "kafka struct<topic:string,partition:long,offset:long>, "
              "zed_type string, ckey string"), "fill")
    assert pool2.compact() == 640
    assert len(pool2.committed_files()) == 1


def test_load_with_precomputed_rows(spark, tmp_path):
    """load(rows=) (round 11): a caller that already counted the exact
    frame (FromKafka's presence aggregation) skips load's own count
    job. The commit must be indistinguishable — same return, same
    manifest row count and offset stats (committed_files pruning), same
    scanned data — and rows=0 must commit nothing, like an empty
    count."""
    import json as _json
    import os as _os

    a = Pool.create(spark, str(tmp_path / "a"))
    b = Pool.create(spark, str(tmp_path / "b"))
    df = spark.createDataFrame(BATCH_1, ROW_SCHEMA)
    assert a.load(df) == 4
    assert b.load(df, rows=4) == 4
    rows_a = sorted(map(tuple, a.scan().select("kafka.offset").collect()))
    rows_b = sorted(map(tuple, b.scan().select("kafka.offset").collect()))
    assert rows_a == rows_b
    ma = _json.load(open(_os.path.join(a._commit_dir(), a.commits()[0])))
    mb = _json.load(open(_os.path.join(b._commit_dir(), b.commits()[0])))
    assert ma["rows"] == mb["rows"] == 4
    assert ma["stats"] == mb["stats"]
    empty = spark.createDataFrame([], ROW_SCHEMA)
    assert b.load(empty, rows=0) == 0
    assert len(b.commits()) == 1


def test_small_python_batch_repartitions_jvm_stays_narrow(spark, tmp_path):
    """Small-batch load path selection (round 11): a Python-sourced frame
    (createDataFrame of local rows = defaultParallelism parallelize
    slices) shrinks via repartition — coalesce(1) would drain every
    slice SERIALLY through one task at a Python-runner round-trip each —
    while JVM/cached sources keep the narrow coalesce (measured faster
    on the warm ingest commit). The committed data must be identical
    either way."""
    from zync_spark.pool import _scans_python_rdd

    df = spark.createDataFrame(BATCH_1, ROW_SCHEMA)
    assert _scans_python_rdd(df)
    assert not _scans_python_rdd(spark.range(5))
    # a cached python-sourced frame drains cheaply -> coalesce path
    # (fresh frame: optimizedPlan is a lazy val memoized per Dataset, so
    # probing the SAME object before persist would pin the uncached plan)
    cached = spark.createDataFrame(BATCH_1, ROW_SCHEMA).persist()
    try:
        cached.count()
        assert not _scans_python_rdd(cached)
        # a cached subtree masks only ITSELF (round 12, ADVICE): a fresh
        # Python-sourced frame unioned beside it is still a live serial
        # drain and must take the repartition path
        assert _scans_python_rdd(
            cached.union(spark.createDataFrame(BATCH_1, ROW_SCHEMA)))
        assert not _scans_python_rdd(cached.union(cached))
    finally:
        cached.unpersist()
    a = Pool.create(spark, str(tmp_path / "a"))
    b = Pool.create(spark, str(tmp_path / "b"))
    assert a.load(df) == 4
    os.environ["SPARK_GRAFT_NO_LOAD_REPART"] = "1"
    try:
        assert b.load(df) == 4
    finally:
        del os.environ["SPARK_GRAFT_NO_LOAD_REPART"]
    rows_a = sorted(map(tuple, a.scan().select(
        "kafka.topic", "kafka.offset", "zed_type").collect()))
    rows_b = sorted(map(tuple, b.scan().select(
        "kafka.topic", "kafka.offset", "zed_type").collect()))
    assert rows_a == rows_b
    # both commits keep the single-file small-batch contract
    assert len(a.committed_files()) == 1
    assert len(b.committed_files()) == 1
