"""Concurrent-maintainer OCC soak (round 7): several writers race on ONE
index pool through the exclusive-manifest-publish protocol — interleaved
tombstone commits (commit_with_retry), delta syncs (rerun on
ConcurrentWriteError, cursor-idempotent), and fold-compactions (abort on
collision, retry next cadence) — plus a crash-mid-commit writer that
left data files with no manifest. The final SEMANTIC state (live docs,
live band rows, live pairs, zero tombstones) must equal a serial replay
of the same logical operations; the kafka commit-seq labels legitimately
differ (they record the interleaving), which is exactly why state
equality is asserted on the masked views, not raw bytes.

Spark job submission is thread-safe; the pool's OCC invariant under test
is pool.py's exclusive publish: no commit is ever lost, no base manifest
ever supersedes a commit it did not read."""

import pytest
import os
import threading

from pyspark.sql import functions as F

from zync_spark.pool import ConcurrentWriteError, Pool
from zync_spark.streaming import dedup_index as DI
from zync_spark.streaming.tombstones import fold_compact, read_tombs

# soak suite: excluded from the pre-commit tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

N_BACKFILL = 80      # ids 0..79; tombstones kill 0..59, 60..79 survive
N_TOMB_EACH = 30     # per tombstoner thread (2 threads), 1-id commits
N_DELTAS = 40        # delta syncs (retried on collision)
N_FOLDS = 12         # fold attempts (collisions expected and fine)


def _env(spark, rows, shift=0):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        F.struct(F.lit("docs").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 (F.col("doc_id") + shift).cast("long").alias("offset")
                 ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value"))


def _doc(i):
    # pairs (2i, 2i+1) are near-dups
    base = f"w{i // 2}a w{i // 2}b w{i // 2}c w{i // 2}d w{i // 2}e"
    return (i, base + (" x1 x2 x3" if i % 2 == 0 else " x1 x2 x4"))


def _spec():
    return DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                             k=3, num_hashes=16, bands=4, threshold=0.5)


def _state(dest, spec):
    """The semantic state of an index pool: live docs, live band rows,
    live pairs — everything the masked views answer from."""
    docs = sorted(r["doc_id"] for r in DI.index_view(dest, spec)
                  .select("doc_id").distinct().collect())
    pairs = sorted((r["id_a"], r["id_b"])
                   for r in DI.pairs_view(dest, spec).collect())
    return docs, pairs


def test_occ_soak_concurrent_maintainers(spark, tmp_path):
    spec = _spec()
    backfill = [_doc(i) for i in range(N_BACKFILL)]
    deltas = [[_doc(1000 + 2 * j), _doc(1000 + 2 * j + 1)]
              for j in range(N_DELTAS)]
    tombs_a = list(range(0, 2 * N_TOMB_EACH, 2))        # evens
    tombs_b = list(range(1, 2 * N_TOMB_EACH, 2))        # odds

    # ---- serial replay: the reference final state --------------------
    ssrc = Pool.create(spark, str(tmp_path / "ssrc"))
    sdst = Pool.create(spark, str(tmp_path / "sdst"))
    ssrc.load(_env(spark, backfill), "backfill")
    DI.sync_index(ssrc, sdst, spec, ["docs"])
    for j, d in enumerate(deltas):
        ssrc.load(_env(spark, d), f"delta{j}")
        DI.sync_index(ssrc, sdst, spec, ["docs"])
    for i in tombs_a:
        DI.tombstone_index(sdst, spec, [i])
    for i in tombs_b:
        DI.tombstone_index(sdst, spec, [i])
    fold_compact(sdst, specs=[spec])
    want = _state(sdst, spec)

    # ---- concurrent run ----------------------------------------------
    csrc = Pool.create(spark, str(tmp_path / "csrc"))
    cdst = Pool.create(spark, str(tmp_path / "cdst"))
    csrc.load(_env(spark, backfill), "backfill")
    DI.sync_index(csrc, cdst, spec, ["docs"])

    errors: list = []
    fold_collisions = [0]
    barrier = threading.Barrier(4)

    def tombstoner(ids):
        barrier.wait()
        try:
            for i in ids:
                while True:
                    try:
                        # commit_with_retry internally; under 4-writer
                        # contention its 8 attempts can still lose —
                        # the outer loop is the maintainer's cadence
                        DI.tombstone_index(cdst, spec, [i])
                        break
                    except ConcurrentWriteError:
                        continue
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    def syncer():
        barrier.wait()
        try:
            for j, d in enumerate(deltas):
                csrc.load(_env(spark, d), f"delta{j}")
                while True:
                    try:
                        DI.sync_index(csrc, cdst, spec, ["docs"])
                        break
                    except ConcurrentWriteError:
                        continue  # cursor-idempotent rerun
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def folder():
        barrier.wait()
        try:
            for _ in range(N_FOLDS):
                try:
                    fold_compact(cdst, specs=[spec])
                except ConcurrentWriteError:
                    fold_collisions[0] += 1  # expected under contention
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=tombstoner, args=(tombs_a,)),
               threading.Thread(target=tombstoner, args=(tombs_b,)),
               threading.Thread(target=syncer),
               threading.Thread(target=folder)]
    for t in threads:
        t.start()
    # crash-mid-commit writer: data files on disk, no manifest ever
    # published — must be invisible to every reader and to the fold
    orphan = os.path.join(str(tmp_path / "cdst"), "data", "deadbeef")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    for t in threads:
        t.join()
    assert not errors, errors

    # quiesce: one final fold (single-writer now) and compare states
    fold_compact(cdst, specs=[spec])
    got = _state(cdst, spec)
    assert got == want
    assert read_tombs(cdst, spec.topic) is None

    # the soak really exercised contention: >=100 commits landed and at
    # least the folder saw the OCC abort path or retried cleanly
    n_commits = len(cdst.commits())
    assert n_commits >= 100, n_commits  # the soak's contract: a real soak

    # crash recovery: the orphan is protected by the retention window
    # (an in-flight writer's files), then reclaimed by an aged vacuum
    assert os.path.exists(orphan)
    cdst.vacuum(retention_s=3600.0)
    assert os.path.exists(orphan)  # young: could be in-flight
    cdst.vacuum(retention_s=0.0)
    assert not os.path.exists(orphan)  # aged out: physically gone
    assert _state(cdst, spec) == want  # vacuum never changes answers
