"""Incremental MinHash-LSH dedup index (streaming/dedup_index.py).

The invariant under test: the pair set accumulated by incremental syncs
over ANY batch split equals the batch operator
(functions.dedup.minhash_lsh_pairs) run once over the full corpus —
same candidates (LSH banding is deterministic), same exact-Jaccard
verification, each pair discovered exactly once."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from zync_spark.pool import Pool
from zync_spark.streaming import dedup_index as DI

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
                [StructField("doc_id", LongType()),
                 StructField("text", StringType())]
            ),
        ),
    ]
)

# Docs engineered so duplicates span batches: 0~1 (near-dup), 2~4
# (near-dup across batch 1 and 3), 3 and 5 unrelated.
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "spark shuffles hash partitions across executors during wide joins"),
    (3, "completely different text about nothing in particular at all here"),
    (4, "spark shuffles hash partitions across executors during wide joins too"),
    (5, "yet another unrelated document with its own private vocabulary set"),
]

BATCHES = [[0, 1], [2, 3], [4, 5]]

SPEC = DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                         k=3, num_hashes=64, bands=16, threshold=0.5)


def _load_batch(spark, pool, batch, start):
    rows = [
        (("docs", 0, start + i), "data", (doc_id, DOCS[doc_id][1]))
        for i, doc_id in enumerate(batch)
    ]
    pool.load(spark.createDataFrame(rows, ROW), f"batch@{start}")
    return start + len(rows)


def _batch_pairs(spark):
    from zync_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", k=SPEC.k, num_hashes=SPEC.num_hashes,
            bands=SPEC.bands, threshold=SPEC.threshold).collect()
    }


@pytest.mark.slow
def test_incremental_equals_batch(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES:
        start = _load_batch(spark, src, batch, start)
        assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DI.pairs_view(dest, SPEC).collect()
    }
    want = _batch_pairs(spark)
    assert got == want and want  # non-degenerate: duplicates exist
    # the engineered cross-batch pair surfaced
    assert (2, 4) in got
    # index holds every document exactly once
    idx = DI.index_view(dest, SPEC).collect()
    assert sorted(r["doc_id"] for r in idx) == [d for d, _ in DOCS]


def test_rerun_is_noop_and_single_batch_equivalent(spark, tmp_path):
    # one big batch == three small ones; a sync with no new data is a no-op
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load_batch(spark, src, [d for b in BATCHES for d in b], 0)
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    got = {
        (r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()
    }
    assert got == set(_batch_pairs(spark))
    n_commits = len(dest.commits())
    assert DI.sync_index(src, dest, SPEC, ["docs"]) == 0  # rerun no-op
    assert len(dest.commits()) == n_commits
    assert {
        (r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()
    } == got


def _many_docs(n):
    """n documents with distinct vocabularies (no near-dups) so their
    band keys spread across prefix buckets."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    return [
        (i, " ".join(f"{w}{i}x{j}" for j, w in enumerate(words)))
        for i in range(n)
    ]


def test_probe_reads_bounded_file_subset(spark, tmp_path):
    """The round-4 scale contract: once the index pool is compacted with
    ckey clustering, a small delta's maintenance pass must read only the
    band/signature buckets it can collide with — NOT the whole stored
    index. Pinned via manifest file counts (committed_files bounds)."""
    docs = _many_docs(60)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("docs", 0, i), "data", (i, t)) for i, t in docs]
    src.load(spark.createDataFrame(rows, ROW), "corpus")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    # small files: each covers a narrow ckey range, so skipping can bite
    DI.compact_index(dest, target_rows=64)
    live = len(dest.committed_files())
    assert live >= 8  # the pin is vacuous on a one-file pool
    # delta: one near-dup of doc 7 (forces a real cross-batch collision)
    src.load(spark.createDataFrame(
        [(("docs", 0, 60), "data", (60, docs[7][1] + " extra"))], ROW), "d")
    stats = {}
    assert DI.sync_index(src, dest, SPEC, ["docs"], stats_out=stats) > 0
    assert stats["live_files"] == live
    # band probe read a strict subset of the files
    assert 0 < stats["probe_files"] < live
    # the colliding doc's signature fetch read a strict subset too
    assert 0 < stats["set_files"] < live
    # and the collision was actually found through the bounded path
    pairs = {(r["id_a"], r["id_b"])
             for r in DI.pairs_view(dest, SPEC).collect()}
    assert (7, 60) in pairs


@pytest.mark.slow
def test_envelope_is_distributed_and_labels_unique(spark, tmp_path):
    """Round-4 fix of the r3 envelope: no global-window offset
    assignment (one task serializing every row of a pass — fatal for an
    initial backfill over an existing corpus). The commit plan must
    contain no SinglePartition exchange and no row_number; and the
    (topic, partition, offset) labels must be unique across the whole
    pool (partition = OCC commit seq, offset = map-side monotonic id)."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    plans = []
    orig_load = Pool.load

    def spy_load(self, df, message="", **kw):
        if self.path == dest.path:
            plans.append(df._jdf.queryExecution().executedPlan().toString())
        return orig_load(self, df, message, **kw)

    start = 0
    try:
        Pool.load = spy_load
        for batch in BATCHES:
            start = _load_batch(spark, src, batch, start)
            assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    finally:
        Pool.load = orig_load
    assert plans
    for p in plans:
        assert "SinglePartition" not in p
        assert "row_number" not in p
    # labels unique pool-wide (tombstones excluded: fixed (0,0) label)
    env = dest.scan().filter(~F.col("zed_type").eqNullSafe("cursors"))
    n = env.count()
    assert n == env.select("kafka.partition", "kafka.offset").distinct().count()
    # pairs are still exactly the batch operator's
    got = {(r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()}
    assert got == set(_batch_pairs(spark))


@pytest.mark.slow
def test_legacy_pool_fallback_and_migration(spark, tmp_path):
    """Pools written before the band-row format (index rows only, no
    ckey) must still sync correctly via the full-scan fallback, and
    migrate_band_rows + compact_index upgrades them to bounded probes."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    # hand-write a legacy-format index commit for docs 0 and 2
    legacy_docs = spark.createDataFrame(
        [(("docs", 0, i), "data", (d, DOCS[d][1]))
         for i, d in enumerate([0, 2])], ROW)
    sigs = DI._sig_frame_unfenced(SPEC, legacy_docs)
    legacy = sigs.select(
        F.struct(F.lit(SPEC.topic).alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("doc_id").alias("offset")).alias("kafka"),
        F.lit("index").alias("zed_type"), "doc_id", "sh_set", "bkeys")
    dest.load(legacy, "legacy index",
              cursors={f"{SPEC.topic}|docs#0": 2})
    # docs 0,2 already consumed (cursor=2); new docs 1 and 4 arrive
    src.load(spark.createDataFrame(
        [(("docs", 0, i), "data", (d, DOCS[d][1]))
         for i, d in enumerate([0, 2, 1, 4])], ROW), "all")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    got = {(r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()}
    assert got == {(0, 1), (2, 4)}  # cross-format collisions found
    # migration adds band rows exactly once, then becomes a no-op
    assert DI.migrate_band_rows(dest, SPEC) > 0
    assert DI.migrate_band_rows(dest, SPEC) == 0
    DI.compact_index(dest, target_rows=8)  # fine files: skipping can bite
    # post-migration syncs probe band rows and stay correct
    src.load(spark.createDataFrame(
        [(("docs", 0, 4), "data", (3, DOCS[3][1]))], ROW), "more")
    stats = {}
    assert DI.sync_index(src, dest, SPEC, ["docs"], stats_out=stats) > 0
    assert stats["probe_files"] < stats["live_files"]
    got = {(r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()}
    assert got == {(0, 1), (2, 4)}  # doc 3 is unrelated — no new pairs
    idx = sorted(r["doc_id"] for r in DI.index_view(dest, SPEC).collect())
    assert idx == [0, 1, 2, 3, 4]


@pytest.mark.slow
def test_auto_compact_cadence(spark, tmp_path):
    """sync_index(auto_compact_every=N) re-clusters once N delta commits
    accrete — results identical, and the pool gains a base manifest."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES:
        start = _load_batch(spark, src, batch, start)
        assert DI.sync_index(src, dest, SPEC, ["docs"],
                             auto_compact_every=2) > 0
    assert dest.commits_since_base() < len(dest.commits())  # a base exists
    got = {(r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()}
    assert got == set(_batch_pairs(spark))


def test_unindexable_batch_still_advances_cursor(spark, tmp_path):
    """A batch whose documents are all shorter than the shingle size
    yields no index rows — the cursor must STILL advance (via the
    tombstone commit), or every later pass re-scans the batch forever."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("docs", 0, 0), "data", (90, "hi")),
            (("docs", 0, 1), "data", (91, "yo"))]
    src.load(spark.createDataFrame(rows, ROW), "short")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0  # tombstone commit
    assert dest.stored_cursors()  # cursor advanced
    assert DI.sync_index(src, dest, SPEC, ["docs"]) == 0  # true no-op now
    # views are unaffected by the tombstone
    assert DI.pairs_view(dest, SPEC).count() == 0
    assert DI.index_view(dest, SPEC).count() == 0
    # and a later REAL batch indexes normally on top of it
    start = 2
    for d in (0, 1):
        src.load(spark.createDataFrame(
            [(("docs", 0, start + d), "data", (d, DOCS[d][1]))], ROW), "b")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    pairs = {(r["id_a"], r["id_b"])
             for r in DI.pairs_view(dest, SPEC).collect()}
    assert (0, 1) in pairs


def test_compact_before_migrate_self_heals(spark, tmp_path):
    """Round-4 review regression: compacting a legacy pool BEFORE
    migrate_band_rows must not hide legacy docs from the probe — the
    compaction transform migrates band rows itself (and a later
    migrate_band_rows is a no-op)."""
    import pyspark.sql.functions as F

    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    legacy_docs = spark.createDataFrame(
        [(("docs", 0, i), "data", (d, DOCS[d][1]))
         for i, d in enumerate([0, 2])], ROW)
    sigs = DI._sig_frame_unfenced(SPEC, legacy_docs)
    legacy = sigs.select(
        F.struct(F.lit(SPEC.topic).alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("doc_id").alias("offset")).alias("kafka"),
        F.lit("index").alias("zed_type"), "doc_id", "sh_set", "bkeys")
    dest.load(legacy, "legacy index",
              cursors={f"{SPEC.topic}|docs#0": 2})
    # compact FIRST (the footgun order): the transform self-migrates
    DI.compact_index(dest, target_rows=16, spec=SPEC)
    assert DI.migrate_band_rows(dest, SPEC) == 0  # nothing left to do
    # new near-dups of both legacy docs arrive and are FOUND
    src.load(spark.createDataFrame(
        [(("docs", 0, 2), "data", (1, DOCS[1][1])),
         (("docs", 0, 3), "data", (4, DOCS[4][1]))], ROW), "delta")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    got = {(r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()}
    assert got == {(0, 1), (2, 4)}


def test_pairs_view_bounded_probe(spark, tmp_path):
    """Round-5 ask #3: pair rows are bucketed by pmod(id_a) — a
    pairs_view(ids=) point lookup reads only the colliding 'p:' buckets'
    files (plus the legacy constant bucket), not the pool's whole pair
    space. Pinned via manifest file counts, like the band probe."""
    docs = _many_docs(60)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("docs", 0, i), "data", (i, t)) for i, t in docs]
    src.load(spark.createDataFrame(rows, ROW), "corpus")
    # near-dups of several docs so the pair space spans many buckets
    extra = [(("docs", 0, 60 + j), "data", (60 + j, docs[j][1] + " zz"))
             for j in range(12)]
    src.load(spark.createDataFrame(extra, ROW), "dups")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    DI.compact_index(dest, target_rows=48)
    live = len(dest.committed_files())
    assert live >= 8
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in DI.pairs_view(dest, SPEC).collect()}
    assert len(full) >= 10
    some_id = sorted({a for a, _ in full})[0]
    stats = {}
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in DI.pairs_view(dest, SPEC, ids=[some_id],
                                  stats_out=stats).collect()}
    # correctness: exactly the full view's pairs with that canonical id
    assert got == {k: v for k, v in full.items() if k[0] == some_id}
    assert got
    # boundedness: a strict subset of the files served the lookup
    assert stats["live_files"] == live
    assert 0 < stats["probe_files"] < live


def test_legacy_constant_pair_bucket_self_heals(spark, tmp_path):
    """Pair rows written with the pre-round-5 constant 'p:' ckey stay
    visible to bounded lookups (the probe set includes 'p:') and are
    rebucketed by the next compact_index."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES:
        start = _load_batch(spark, src, batch, start)
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    # forge the legacy layout: rewrite every pair row's ckey to 'p:'
    df = dest.scan()
    legacy = df.withColumn(
        "ckey", F.when(F.col("zed_type") == "duppair", F.lit("p:"))
        .otherwise(F.col("ckey")))
    dest.compact(transform=lambda _: legacy, cluster_by=["ckey"],
                 target_rows=32)
    full = {(r["id_a"], r["id_b"]) for r in DI.pairs_view(dest, SPEC).collect()}
    assert full  # sanity: the forged pool still has pairs
    a0 = sorted({a for a, _ in full})[0]
    got = {(r["id_a"], r["id_b"])
           for r in DI.pairs_view(dest, SPEC, ids=[a0]).collect()}
    assert got == {k for k in full if k[0] == a0}  # legacy bucket probed
    # self-heal: compaction rebuckets the constant 'p:' rows
    DI.compact_index(dest, target_rows=32)
    bad = dest.scan().filter(
        (F.col("zed_type") == "duppair") & (F.col("ckey") == "p:")).count()
    assert bad == 0
    got2 = {(r["id_a"], r["id_b"])
            for r in DI.pairs_view(dest, SPEC, ids=[a0]).collect()}
    assert got2 == got


def test_fresh_commits_are_boundedly_probed(spark, tmp_path):
    """Round-5 beyond-ask: sync commits are ckey-clustered AT LOAD TIME
    (Pool.load cluster_by records per-file stats), so the bounded probe
    skips non-colliding files of FRESH commits too — boundedness no
    longer waits for compact_index. No compaction happens anywhere in
    this test."""
    docs = _many_docs(60)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("docs", 0, i), "data", (i, t)) for i, t in docs]
    src.load(spark.createDataFrame(rows, ROW), "corpus")
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    live = len(dest.committed_files())
    assert live >= 8  # the clustered load split the key spaces
    src.load(spark.createDataFrame(
        [(("docs", 0, 60), "data", (60, docs[7][1] + " extra"))], ROW), "d")
    stats = {}
    assert DI.sync_index(src, dest, SPEC, ["docs"], stats_out=stats) > 0
    assert stats["live_files"] == live
    # the band probe skips at least the signature/pair key spaces' files
    # of the fresh commit (16 uniform band prefixes may touch every
    # band file — the structural win is never reading the other spaces)
    assert 0 < stats["probe_files"] < live   # skipped WITHOUT compaction
    # the signature fetch (1 colliding doc = 1 bucket) skips nearly all
    assert 0 < stats["set_files"] < max(3, live // 2)
    pairs = {(r["id_a"], r["id_b"])
             for r in DI.pairs_view(dest, SPEC).collect()}
    assert (7, 60) in pairs


def test_drifted_spec_fails_loud(spark, tmp_path):
    """k/num_hashes/bands/prefix_len are baked into stored signatures,
    band keys, and ckeys — a sync or view under a changed spec must
    raise (the persisted meta contract, round-5 session-4), never
    silently produce incomparable signatures. threshold is a per-pass
    policy knob and stays changeable."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load_batch(spark, src, BATCHES[0], 0)
    assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    _load_batch(spark, src, BATCHES[1], 2)
    drifted = DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                                k=4, num_hashes=SPEC.num_hashes,
                                bands=SPEC.bands, threshold=SPEC.threshold)
    with pytest.raises(ValueError, match="fixed for the life"):
        DI.sync_index(src, dest, drifted, ["docs"])
    with pytest.raises(ValueError, match="fixed for the life"):
        DI.pairs_view(dest, drifted)
    # threshold-only change is allowed (policy knob, applies per pass)
    relaxed = DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                                k=SPEC.k, num_hashes=SPEC.num_hashes,
                                bands=SPEC.bands, threshold=0.9)
    assert DI.sync_index(src, dest, relaxed, ["docs"]) > 0


@pytest.mark.slow
def test_rebuild_rebuckets_in_place(spark, tmp_path):
    """rebuild_index re-buckets every key space under a new prefix_len
    from stored rows alone; the old contract then fails loud, the new
    one keeps incremental == batch across the rebuild."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES[:2]:
        start = _load_batch(spark, src, batch, start)
        assert DI.sync_index(src, dest, SPEC, ["docs"]) > 0
    new_spec = DI.rebuild_index(dest, SPEC, prefix_len=3)
    assert new_spec.prefix_len == 3
    with pytest.raises(ValueError, match="fixed for the life"):
        DI.pairs_view(dest, SPEC)
    _load_batch(spark, src, BATCHES[2], start)
    assert DI.sync_index(src, dest, new_spec, ["docs"]) > 0
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DI.pairs_view(dest, new_spec).collect()
    }
    assert got == _batch_pairs(spark)
    assert (2, 4) in got  # the cross-batch pair found through new buckets
