"""Incremental BM25 text index (streaming/text_index.py).

Invariants: (1) an index built incrementally over ANY commit split
answers queries identically to one built in a single batch (postings
partition by delta; stat partials merge exactly); (2) reruns are
no-ops; (3) a query reads only its terms' posting buckets + the
candidates' length buckets — pinned via manifest file counts, with NO
compaction needed (load-clustered commits)."""

import pytest
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming import text_index as TI

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<doc_id:long,text:string>")

SPEC = TI.TextIndexSpec("d", "value.doc_id", "value.text")

WORDS = ["spark", "query", "table", "join", "scan", "sort", "merge",
         "filter", "window", "stream", "batch", "column"]


def _text(i):
    # deterministic, term-diverse documents with varied lengths
    n = 5 + (i * 7) % 23
    return " ".join(WORDS[(i * 13 + j * 5) % len(WORDS)] for j in range(n))


def _load(spark, src, lo, hi):
    rows = [(("docs", 0, i), "data", (i, _text(i))) for i in range(lo, hi)]
    src.load(spark.createDataFrame(rows, ROW), f"[{lo},{hi})")


def _ranked(df):
    return [(r["doc_id"], r["rank"], r["score"]) for r in
            sorted(df.collect(), key=lambda r: r["rank"])]


def test_incremental_equals_single_batch(spark, tmp_path):
    src1 = Pool.create(spark, str(tmp_path / "s1"))
    one = Pool.create(spark, str(tmp_path / "i1"))
    _load(spark, src1, 0, 60)
    assert TI.sync_text(src1, one, SPEC, ["docs"]) > 0

    src3 = Pool.create(spark, str(tmp_path / "s3"))
    inc = Pool.create(spark, str(tmp_path / "i3"))
    for lo, hi in ((0, 20), (20, 45), (45, 60)):
        _load(spark, src3, lo, hi)
        assert TI.sync_text(src3, inc, SPEC, ["docs"]) > 0
    # stat partials merge exactly
    assert TI.corpus_stats(inc, SPEC) == TI.corpus_stats(one, SPEC)
    q = "spark table filter"
    assert _ranked(TI.search_text(inc, SPEC, q, k=8)) == \
        _ranked(TI.search_text(one, SPEC, q, k=8))
    # rerun with no new data is a no-op
    n_commits = len(inc.commits())
    assert TI.sync_text(src3, inc, SPEC, ["docs"]) == 0
    assert len(inc.commits()) == n_commits


def test_query_reads_bounded_file_subset(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 80)
    assert TI.sync_text(src, dest, SPEC, ["docs"]) > 0
    live = len(dest.committed_files())
    assert live >= 6  # the clustered load split the key spaces
    stats: dict = {}
    got = TI.search_text(dest, SPEC, "spark", k=5, stats_out=stats)
    assert got.count() == 5
    assert stats["live_files"] == live
    # one term = one bucket: a strict file subset serves the probe,
    # with NO compaction anywhere in this test
    assert 0 < stats["probe_files"] < live
    assert 0 < stats["dlen_files"] < live
    # compaction never changes results
    pre = _ranked(TI.search_text(dest, SPEC, "spark query", k=6))
    TI.compact_text(dest, target_rows=200)
    stats2: dict = {}
    post = _ranked(TI.search_text(dest, SPEC, "spark query", k=6,
                                  stats_out=stats2))
    assert pre == post
    assert 0 < stats2["probe_files"] < stats2["live_files"]


def test_scoring_matches_reference_bm25(spark, tmp_path):
    """The stored-index scorer equals a direct BM25 computed from the
    raw corpus with the same quantization — no drift between what the
    index stores and what the formula needs."""
    import math

    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)
    TI.sync_text(src, dest, SPEC, ["docs"])
    docs = {i: _text(i).split() for i in range(30)}
    n = len(docs)
    sum_dl = sum(len(t) for t in docs.values())
    term = "spark"
    dfreq = sum(1 for t in docs.values() if term in t)
    idf = math.floor(math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                     * 1000000)
    expect = {}
    for i, toks in docs.items():
        tf = toks.count(term)
        if not tf:
            continue
        dl = len(toks)
        expect[i] = math.floor(
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl * n / sum_dl))))
    got = {r["doc_id"]: r["score"]
           for r in TI.search_text(dest, SPEC, term, k=30).collect()}
    assert got == expect


def test_edge_cases(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    with pytest.raises(ValueError):
        TI.search_text(dest, SPEC, "   ")
    _load(spark, src, 0, 10)
    TI.sync_text(src, dest, SPEC, ["docs"])
    # unknown terms: empty typed frame, not a crash
    assert TI.search_text(dest, SPEC, "zzz qqq", k=3).count() == 0
    # duplicate query terms count once (bag-of-words query)
    a = _ranked(TI.search_text(dest, SPEC, "spark spark", k=5))
    b = _ranked(TI.search_text(dest, SPEC, "spark", k=5))
    assert a == b
    # auto-compact cadence folds the accreted commits
    _load(spark, src, 10, 20)
    TI.sync_text(src, dest, SPEC, ["docs"], auto_compact_every=1)
    assert dest.commits_since_base() == 0


def test_drifted_prefix_len_fails_loud(spark, tmp_path):
    """prefix_len is baked into stored term/doc ckeys — a sync or search
    under a changed value must raise (persisted meta contract), never
    silently probe past stored posting buckets."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("docs", 0, i), "data", (i, _text(i))) for i in range(10)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    assert TI.sync_text(src, dest, SPEC, ["docs"]) > 0
    drifted = TI.TextIndexSpec("d", "value.doc_id", "value.text",
                               prefix_len=4)
    src.load(spark.createDataFrame(
        [(("docs", 0, 10), "data", (10, _text(10)))], ROW), "d")
    with pytest.raises(ValueError, match="fixed for the life"):
        TI.sync_text(src, dest, drifted, ["docs"])
    with pytest.raises(ValueError, match="fixed for the life"):
        TI.search_text(dest, drifted, "spark table")
    # the true spec still works
    assert TI.sync_text(src, dest, SPEC, ["docs"]) > 0


def test_rebuild_rebuckets_in_place(spark, tmp_path):
    """rebuild_text re-buckets postings and dlens under a new prefix_len
    from stored rows alone; search through the new buckets matches the
    pre-rebuild results and later syncs continue under the new spec."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(("docs", 0, i), "data", (i, _text(i))) for i in range(30)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    assert TI.sync_text(src, dest, SPEC, ["docs"]) > 0
    before = [(r["doc_id"], r["rank"], r["score"])
              for r in TI.search_text(dest, SPEC, "spark table", k=5)
              .collect()]
    new_spec = TI.rebuild_text(dest, SPEC, prefix_len=3, target_rows=50)
    with pytest.raises(ValueError, match="fixed for the life"):
        TI.search_text(dest, SPEC, "spark table")
    stats = {}
    after = [(r["doc_id"], r["rank"], r["score"])
             for r in TI.search_text(dest, new_spec, "spark table", k=5,
                                     stats_out=stats).collect()]
    assert after == before and before
    assert 0 < stats["probe_files"] < stats["live_files"]
    src.load(spark.createDataFrame(
        [(("docs", 0, 30), "data", (30, _text(3)))], ROW), "d")
    assert TI.sync_text(src, dest, new_spec, ["docs"]) > 0
