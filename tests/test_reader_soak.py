"""Reader-vs-maintenance consistency (round 8, VERDICT ask #4).

test_occ_soak races WRITERS against each other; this suite races
READERS against fold_compact + vacuum. The contract under test:

1. a scan/search/view concurrent with folds serves a CONSISTENT
   manifest state — old or new, never torn (fold preserves the live
   semantic view by construction, so during a fold-only maintenance
   phase every read must equal the one semantic state);
2. vacuum's retention window covers in-flight readers: a file list
   resolved against a live manifest stays materializable for
   `retention_s` after the compaction that superseded it (Pool.vacuum's
   round-8 reader guard — superseded files age from the newest BASE
   manifest's timestamp, not from their write mtime);
3. a reader that dwells PAST the window fails LOUDLY (Spark raises on
   a vanished file), never silently returning partial rows;
4. a read concurrent with a writer commit sees one of the two legal
   states, never a mixture.
"""

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming import text_index as TI
from zync_spark.streaming.tombstones import (fold_compact, mask_rows,
                                             read_tombs)

# soak suite: excluded from the pre-commit tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

from tests.test_text_index import ROW, SPEC, _load, _text


def _live_docs(dest):
    df = dest.scan()
    if df is None or "doc_id" not in df.columns:
        return frozenset()
    rows = mask_rows(df.filter(F.col("zed_type").eqNullSafe("dlen")),
                     read_tombs(dest, SPEC.topic), "doc_id").collect()
    return frozenset(r["doc_id"] for r in rows)


def _search_ids(dest):
    return tuple(r["doc_id"] for r in sorted(
        TI.search_text(dest, SPEC, "spark table", k=8).collect(),
        key=lambda r: r["rank"]))


def _backdate(pool, secs=7200):
    """Age every data dir's mtime: in a seconds-long test the mtime
    guard alone would mask whether the READER window does its job."""
    root = os.path.join(pool.path, "data")
    old = time.time() - secs
    for d in os.listdir(root):
        sub = os.path.join(root, d)
        if os.path.isdir(sub):
            os.utime(sub, (old, old))


def _build(spark, tmp_path, n=40, kill=(3, 7)):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, n)
    assert TI.sync_text(src, dest, SPEC, ["docs"]) > 0
    if kill:
        TI.tombstone_text(dest, SPEC, list(kill))
    return src, dest


def test_reads_consistent_across_folds_and_vacuum(spark, tmp_path):
    """Phase 1: readers hammer the index while folds + (windowed)
    vacuums run. The semantic state is constant during maintenance, so
    EVERY read must equal it — old manifests and the new base are both
    legal, a mixture is not."""
    _, dest = _build(spark, tmp_path)
    want_docs = _live_docs(dest)
    want_hits = _search_ids(dest)
    assert want_docs and want_hits
    errors: list = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                got = _live_docs(dest)
                if got != want_docs:
                    errors.append(f"doc view tore: {sorted(got)}")
                    return
                hits = _search_ids(dest)
                if hits != want_hits:
                    errors.append(f"search tore: {hits}")
                    return
        except Exception as e:  # noqa: BLE001 - the soak records it
            errors.append(f"reader raised during windowed phase: {e!r}")

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        # maintenance under readers: two fold cycles, each followed by
        # a WINDOWED vacuum (retention covers the readers, so nothing
        # they resolved may vanish — the round-8 guard; backdating the
        # dirs defeats the mtime guard so only the base-ts reader
        # window is protecting them)
        for _ in range(2):
            fold_compact(dest, specs=[SPEC], target_rows=16)
            _backdate(dest)
            dest.vacuum(retention_s=3600.0)
            time.sleep(0.2)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors
    assert _live_docs(dest) == want_docs
    assert _search_ids(dest) == want_hits


def test_vacuum_window_covers_resolved_file_lists(spark, tmp_path):
    """Phase 2: a file list resolved BEFORE a fold stays materializable
    for retention_s after it — the in-flight reader guarantee."""
    _, dest = _build(spark, tmp_path)
    stale = dest.scan()  # resolves the PRE-fold file list
    want = stale.count()
    fold_compact(dest, specs=[SPEC], target_rows=16)
    _backdate(dest)  # mtime guard out of the way: only the reader
    # window (newest base ts is fresh) protects the superseded files
    assert dest.vacuum(retention_s=3600.0) == 0
    assert stale.count() == want  # full rows, no silent loss


def test_dwell_past_window_fails_loud_never_partial(spark, tmp_path):
    """Phase 3: past the window the superseded files go away and the
    stale reader RAISES (ignoreMissingFiles=false) — it must never
    return a silently partial result. Fresh readers see the live
    state."""
    _, dest = _build(spark, tmp_path)
    stale = dest.scan()
    want_docs = _live_docs(dest)
    fold_compact(dest, specs=[SPEC], target_rows=16)
    _backdate(dest)
    assert dest.vacuum(retention_s=0) > 0  # window disabled: reclaim
    with pytest.raises(Exception):
        stale.count()
    assert _live_docs(dest) == want_docs  # fresh resolution: intact


def test_read_during_writer_commit_sees_legal_state(spark, tmp_path):
    """Phase 4: reads racing a writer land on one of the two legal
    states (before/after the sync), never a mixture."""
    src, dest = _build(spark, tmp_path, n=30, kill=())
    before = _live_docs(dest)
    _load(spark, src, 30, 45)
    after = before | frozenset(range(30, 45))
    errors: list = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                got = _live_docs(dest)
                if got not in (before, after):
                    errors.append(f"torn doc view: {sorted(got)}")
                    return
        except Exception as e:  # noqa: BLE001
            errors.append(f"reader raised: {e!r}")

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        assert TI.sync_text(src, dest, SPEC, ["docs"]) > 0
        time.sleep(0.2)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors
    assert _live_docs(dest) == after
