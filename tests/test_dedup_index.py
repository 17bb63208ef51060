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
