"""Incremental IVF ANN index (streaming/ann_index.py).

Invariants: (1) an index built incrementally over ANY commit split
answers queries identically to the batch IVF operator run with the same
frozen centroids over the full corpus (assignment depends only on
(vector, centroids)); (2) reruns are no-ops; (3) after compaction a
query reads only its probed cells' files."""

import math

import pytest
from pyspark.sql import functions as F

from zync_spark.functions import similarity as S
from zync_spark.pool import Pool
from zync_spark.streaming import ann_index as AI

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<vec_id:long,emb:array<double>>")

SPEC = AI.AnnIndexSpec("v", "value.vec_id", "value.emb",
                       n_cells=4, iterations=2)
DIM = 6


def _vec(i):
    # deterministic, well-spread vectors
    return [math.sin(0.7 * i + j) + 0.01 * ((i * 31 + j * 17) % 19)
            for j in range(DIM)]


def _corpus(spark, n):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)],
        "vec_id long, embedding array<double>")


def _load(spark, src, lo, hi):
    rows = [(("emb", 0, i), "data", (i, _vec(i))) for i in range(lo, hi)]
    src.load(spark.createDataFrame(rows, ROW), f"[{lo},{hi})")


@pytest.mark.slow
def test_incremental_equals_batch_with_frozen_centroids(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)                        # backfill: trains quantizer
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    cents_after_backfill = AI.stored_centroids(dest, SPEC)
    _load(spark, src, 30, 50)                       # delta: frozen centroids
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    # centroids did NOT retrain
    assert AI.stored_centroids(dest, SPEC) == cents_after_backfill
    # rerun with no new data is a no-op
    n_commits = len(dest.commits())
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) == 0
    assert len(dest.commits()) == n_commits

    corpus = _corpus(spark, 50)
    queries = corpus.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 12))
        for r in AI.ann_query(dest, SPEC, queries, k=3, nprobe=2).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 12))
        for r in S.ivf_ann_topk(corpus, queries, k=3,
                                nprobe=2,
                                centroids=cents_after_backfill).collect()
    }
    assert got == want and len(got) == 15  # 5 queries x top-3


@pytest.mark.slow
def test_query_probe_reads_bounded_file_subset(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 60)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    AI.compact_ann(dest, target_rows=8)  # many small clustered files
    live = len(dest.committed_files())
    assert live >= 6
    queries = _corpus(spark, 60).filter(F.col("vec_id") < 2)
    stats: dict = {}
    pre = AI.ann_query(dest, SPEC, queries, k=3, nprobe=1,
                       stats_out=stats).collect()
    assert stats["live_files"] == live
    assert 0 < stats["probe_files"] < live  # only probed cells' files
    assert len(pre) > 0
    # compaction/skipping never changes results
    stats2: dict = {}
    dest2 = Pool.create(spark, str(tmp_path / "idx2"))
    src2 = Pool.create(spark, str(tmp_path / "src2"))
    _load(spark, src2, 0, 60)
    AI.sync_ann(src2, dest2, SPEC, ["emb"])
    uncompacted = AI.ann_query(dest2, SPEC, queries, k=3, nprobe=1,
                               stats_out=stats2).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"])
                              for r in rows)
    assert key(pre) == key(uncompacted)


def test_query_plan_broadcasts_and_stays_jvm(spark, tmp_path):
    """ann_query's plan: the (small) assigned query batch broadcasts onto
    the bounded cell scan — no shuffle join, no Python nodes, and no
    SinglePartition exchange anywhere (the envelope fix is shared with
    the dedup index; the only window partitions by query_id)."""
    import re

    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 40)
    AI.sync_ann(src, dest, SPEC, ["emb"])
    q = AI.ann_query(dest, SPEC, _corpus(spark, 40).filter("vec_id < 3"),
                     k=3, nprobe=2)
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "SinglePartition" not in p
    assert re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas", p) is None


def test_unindexable_delta_advances_cursor(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("emb", 0, 0), "data", (0, None)),
            (("emb", 0, 1), "data", (1, []))]
    src.load(spark.createDataFrame(rows, ROW), "nulls")
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0  # tombstone commit
    assert dest.stored_cursors()
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) == 0  # true no-op
    with pytest.raises(ValueError):
        AI.ann_query(dest, SPEC, _corpus(spark, 4))
    # a later REAL backfill trains and indexes normally on top
    _load(spark, src, 2, 22)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    assert AI.stored_centroids(dest, SPEC)


def test_min_train_defers_quantizer_training(spark, tmp_path):
    """ADVICE closure: with min_train set, a tiny first delta (the first
    micro-batch through FromKafka(indexes=)) must NOT freeze a degenerate
    quantizer — the pass defers (no commit, cursors unmoved) and a later
    pass trains once the accreted delta meets the floor."""
    import warnings

    spec = AI.AnnIndexSpec("v", "value.vec_id", "value.emb",
                           n_cells=4, iterations=2, min_train=20)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 5)  # 5 vectors < min_train
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert AI.sync_ann(src, dest, spec, ["emb"]) == 0
    assert any("deferring" in str(x.message) for x in w)
    assert len(dest.commits()) == 0          # nothing frozen
    assert AI.stored_centroids(dest, spec) is None
    _load(spark, src, 5, 30)                 # delta accretes to 30
    assert AI.sync_ann(src, dest, spec, ["emb"]) > 0
    cents = AI.stored_centroids(dest, spec)
    assert cents is not None  # k-means may drop an emptied cell; the
    # load-bearing check is batch-equality below, not an exact count
    # the quantizer trained on ALL 30 (the deferred delta re-scanned):
    # identical to batch training over rows 0..30
    expect = S.kmeans_centroids(_corpus(spark, 30), k=4, iterations=2,
                                id_col="vec_id", vec_col="embedding")
    assert cents == expect


def test_small_training_set_warns_without_min_train(spark, tmp_path):
    """Without min_train the old behavior stands, but freezing a
    quantizer below ~8 vectors/cell warns (FAISS-style heuristic)."""
    import warnings

    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 6)  # 6 < 4 cells * 8
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    assert any("FROZEN" in str(x.message) for x in w)
    assert AI.stored_centroids(dest, SPEC) is not None


@pytest.mark.slow
def test_rebuild_retrains_and_requeries_like_batch(spark, tmp_path):
    """Round-5 ask #1b: rebuild_ann retrains the quantizer over the FULL
    stored corpus and re-shards every vec row in one OCC base commit.
    Differential: post-rebuild ann_query ≡ the batch IVF recipe run with
    the rebuild's centroids (train-on-everything), and those centroids ≡
    batch k-means over the whole corpus — NOT the frozen first-delta
    quantizer."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    # deliberately unrepresentative first delta: 8 vectors
    _load(spark, src, 0, 8)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    frozen = AI.stored_centroids(dest, SPEC)
    _load(spark, src, 8, 48)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    n = AI.rebuild_ann(dest, SPEC, target_rows=64)
    assert n > 0
    cents = AI.stored_centroids(dest, SPEC)
    full = S.kmeans_centroids(_corpus(spark, 48), k=SPEC.n_cells,
                              iterations=SPEC.iterations,
                              id_col="vec_id", vec_col="embedding")
    assert cents == full        # trained on everything...
    assert cents != frozen      # ...not the bad frozen quantizer
    # exactly one centroid row set survives (old ones dropped)
    ncent = dest.scan().filter(F.col("zed_type") == "centroid").count()
    assert ncent == len(cents)
    # post-rebuild query ≡ batch IVF with the new centroids
    qs = _corpus(spark, 48).filter(F.col("vec_id") < 6)
    got = AI.ann_query(dest, SPEC, qs, k=4, nprobe=2).collect()
    want = S.ivf_ann_topk(_corpus(spark, 48), qs, "vec_id", "embedding",
                          k=4, nprobe=2, centroids=cents).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(((r["query_id"], r["neighbor_id"], r["rank"]) for r in got)) \
        == sorted(((r["query_id"], r["neighbor_id"], r["rank"]) for r in want))
    # maintenance continues against the NEW quantizer
    _load(spark, src, 48, 52)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    assert AI.stored_centroids(dest, SPEC) == cents


@pytest.mark.slow
def test_recall_improves_after_rebuild(spark, tmp_path):
    """Round-5 ask #1a: ann_recall measures retrieval quality (recall@k
    vs exact top-k over the stored corpus). A quantizer frozen on a tiny
    unrepresentative first delta scores <= the rebuilt one, and the
    rebuilt index's recall is high at a generous nprobe."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 6)   # degenerate training set
    AI.sync_ann(src, dest, SPEC, ["emb"])
    _load(spark, src, 6, 60)
    AI.sync_ann(src, dest, SPEC, ["emb"])
    qs = _corpus(spark, 60).filter(F.col("vec_id") % 7 == 0)
    before = AI.ann_recall(dest, SPEC, qs, k=5, nprobe=2)
    avg_before = before.agg(F.avg("recall")).collect()[0][0]
    AI.rebuild_ann(dest, SPEC, target_rows=64)
    after = AI.ann_recall(dest, SPEC, qs, k=5, nprobe=2)
    avg_after = after.agg(F.avg("recall")).collect()[0][0]
    assert 0.0 <= avg_before <= 1.0 and 0.0 <= avg_after <= 1.0
    assert avg_after >= avg_before - 1e-9
    # full probe = exact: recall@k must be 1 when every cell is probed
    full = AI.ann_recall(dest, SPEC, qs, k=5, nprobe=SPEC.n_cells)
    assert full.agg(F.min("recall")).collect()[0][0] == 1.0


def test_fresh_commits_are_boundedly_probed(spark, tmp_path):
    """Round-5 beyond-ask twin of the dedup test: sync commits are
    ckey-clustered at LOAD time, so ann_query's cell-bounded read skips
    a fresh commit's non-probed cells with NO compact_ann anywhere."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 60)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    live = len(dest.committed_files())
    assert live >= 6  # clustered load split the cells across files
    queries = _corpus(spark, 60).filter(F.col("vec_id") < 2)
    stats: dict = {}
    got = AI.ann_query(dest, SPEC, queries, k=3, nprobe=1,
                       stats_out=stats).collect()
    assert stats["live_files"] == live
    assert 0 < stats["probe_files"] < live  # no compaction needed
    assert len(got) > 0
