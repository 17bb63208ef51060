"""Incremental duplicated-span index (streaming/span_index.py).

The invariant under test: the span set accumulated by incremental syncs
over ANY batch split equals the batch operator
(functions.dedup.duplicate_spans) run once over the full corpus — the
duplication rule is monotone in the ingested prefix, hits are emitted
exactly once (dup markers), and spans_view's island merge runs across
commits, so a contiguous duplicated region assembled by TWO different
later arrivals still yields one maximal span."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from zync_spark.functions.dedup import duplicate_spans
from zync_spark.pool import Pool
from zync_spark.streaming import span_index as SI

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

# 16 shared base tokens; doc 0 carries all of them, doc 2 (batch 2)
# shares tokens 0..9, doc 4 (batch 3) shares tokens 6..15 — so doc 0's
# duplicated region is assembled by two DIFFERENT later arrivals whose
# hit ranges overlap (0..6 then 6..12 at window=4), and the island
# merge across commits must produce ONE maximal span [0, 15].
_A = [f"tok{i:02d}" for i in range(16)]
DOCS = [
    (0, " ".join(_A)),
    (1, "nothing here resembles anything else in this corpus at all ever"),
    (2, " ".join(_A[:10]) + " uniquely trailing junk two"),
    (3, "same batch twin same batch twin same batch twin padding words"),
    (5, "same batch twin same batch twin same batch twin padding words"),
    (4, " ".join(_A[6:]) + " other trailing filler four"),
    (6, "solitary closing document with private vocabulary only here now"),
]
BATCHES = [[0, 1], [2, 3, 5], [4, 6]]
TEXT = dict(DOCS)

SPEC = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                        window=4, min_docs=2)


def _load_batch(spark, pool, batch, start):
    rows = [
        (("docs", 0, start + i), "data", (doc_id, TEXT[doc_id]))
        for i, doc_id in enumerate(batch)
    ]
    pool.load(spark.createDataFrame(rows, ROW), f"batch@{start}")
    return start + len(rows)


def _batch_spans(spark, min_docs=2):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(docs, "doc_id", "text",
                                 window=SPEC.window,
                                 min_docs=min_docs).collect()
    }


def _view_spans(dest, **kw):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in SI.spans_view(dest, SPEC, **kw).collect()
    }


@pytest.mark.slow
def test_incremental_equals_batch_with_cross_commit_island_merge(
        spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES:
        start = _load_batch(spark, src, batch, start)
        assert SI.sync_spans(src, dest, SPEC, ["docs"]) > 0
    got = _view_spans(dest)
    want = _batch_spans(spark)
    assert got == want and want  # non-degenerate
    # the two-arrival assembly produced ONE maximal span over doc 0
    assert (0, 0, 15, 16) in got
    # same-batch twins found at discovery time, not only retroactively
    assert any(d == 3 for d, *_ in got) and any(d == 5 for d, *_ in got)
    # hits are exactly-once: no duplicate (doc, pos) rows ever written
    hits = dest.scan().filter(F.col("zed_type") == "hit") \
        .select("doc_id", "pos")
    assert hits.count() == hits.distinct().count()


def test_rerun_is_noop_and_single_batch_equivalent(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load_batch(spark, src, [d for b in BATCHES for d in b], 0)
    assert SI.sync_spans(src, dest, SPEC, ["docs"]) > 0
    assert _view_spans(dest) == _batch_spans(spark)
    n_commits = len(dest.commits())
    assert SI.sync_spans(src, dest, SPEC, ["docs"]) == 0
    assert len(dest.commits()) == n_commits
    assert _view_spans(dest) == _batch_spans(spark)


@pytest.mark.slow
def test_min_docs_one_matches_batch_self_repeats(spark, tmp_path):
    spec = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                            window=4, min_docs=1)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES:
        start = _load_batch(spark, src, batch, start)
        SI.sync_spans(src, dest, spec, ["docs"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in SI.spans_view(dest, spec).collect()
    }
    want = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(
            spark.createDataFrame(DOCS, "doc_id long, text string"),
            "doc_id", "text", window=4, min_docs=1).collect()
    }
    assert got == want
    # docs 3/5 repeat "same batch twin" within themselves too
    assert any(d == 3 for d, *_ in got)


def _many_docs(n):
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    return [(i, " ".join(f"{w}{i}x{j}" for j, w in enumerate(words)))
            for i in range(n)]


def test_probe_and_view_read_bounded_file_subsets(spark, tmp_path):
    """The scale contract: after ckey compaction, (a) a small delta's
    sync probes only its hashes' w:/d: buckets, (b) spans_view(doc_ids=)
    reads only those docs' h: buckets — both pinned via manifest file
    counts, and the cross-batch duplicate is found through the bounded
    path."""
    docs = _many_docs(60)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    # prefix_len=3: 4096 buckets — the module's own sizing rule (the
    # bucket space must dwarf the DELTA's token count for the file pin
    # to have room; at the default 256 a 12-token probe still covers
    # only ~5% of buckets, but compaction packs multiple buckets per
    # file, eroding the file-level margin on tiny test corpora)
    spec = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                            window=4, min_docs=2, prefix_len=3)
    rows = [(("docs", 0, i), "data", (i, t)) for i, t in docs]
    src.load(spark.createDataFrame(rows, ROW), "corpus")
    assert SI.sync_spans(src, dest, spec, ["docs"]) > 0
    SI.compact_spans(dest, target_rows=64)
    live = len(dest.committed_files())
    assert live >= 8
    # delta: one doc repeating doc 7's text (cross-batch duplicate)
    src.load(spark.createDataFrame(
        [(("docs", 0, 60), "data", (60, docs[7][1]))], ROW), "d")
    stats = {}
    assert SI.sync_spans(src, dest, spec, ["docs"], stats_out=stats) > 0
    assert stats["live_files"] == live
    assert 0 < stats["probe_files"] < live
    vstats = {}
    got = {
        (r["doc_id"], r["span_start"])
        for r in SI.spans_view(dest, spec, doc_ids=[7, 60],
                               stats_out=vstats).collect()
    }
    assert got == {(7, 0), (60, 0)}
    assert 0 < vstats["hit_files"] < vstats["live_files"]


def test_spec_validation_and_yaml_kind_guard(spark, tmp_path):
    with pytest.raises(ValueError):
        SI.SpanIndexSpec("x", "a", "b", window=1)
    with pytest.raises(ValueError):
        SI.SpanIndexSpec("x", "a", "b", min_docs=0)
    with pytest.raises(ValueError):
        SI.SpanIndexSpec("x", "a", "b", prefix_len=0)
    p = tmp_path / "spec.yaml"
    p.write_text("name: d\nid: value.doc_id\ntext: value.text\n")
    with pytest.raises(ValueError, match="kind: span"):
        SI.load_span_spec(str(p))
    p.write_text("kind: span\nname: d\nid: value.doc_id\n"
                 "text: value.text\nwindow: 6\nmin_docs: 1\n")
    spec, doc = SI.load_span_spec(str(p))
    assert (spec.window, spec.min_docs, spec.topic) == (6, 1, "spanindex:d")


def test_drifted_spec_fails_loud(spark, tmp_path):
    """window/min_docs/prefix_len are baked into stored hashes/ckeys: a
    sync or view under a changed spec must raise (the persisted meta
    contract), never silently miss stored rows."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load_batch(spark, src, BATCHES[0], 0)
    assert SI.sync_spans(src, dest, SPEC, ["docs"]) > 0
    _load_batch(spark, src, BATCHES[1], 2)
    drifted = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                               window=4, min_docs=2, prefix_len=4)
    with pytest.raises(ValueError, match="fixed for the life"):
        SI.sync_spans(src, dest, drifted, ["docs"])
    with pytest.raises(ValueError, match="fixed for the life"):
        SI.spans_view(dest, drifted).collect()
    wider = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                             window=6, min_docs=2)
    with pytest.raises(ValueError, match="fixed for the life"):
        SI.sync_spans(src, dest, wider, ["docs"])
    # the true spec still works
    assert SI.sync_spans(src, dest, SPEC, ["docs"]) > 0


@pytest.mark.slow
def test_rebuild_changes_contract_in_place(spark, tmp_path):
    """rebuild_spans re-derives hits/markers under a new min_docs and
    re-buckets under a new prefix_len from the STORED windows alone (no
    source re-read), rewrites the meta row, and later syncs under the
    returned spec keep incremental == batch."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    start = 0
    for batch in BATCHES[:2]:
        start = _load_batch(spark, src, batch, start)
        assert SI.sync_spans(src, dest, SPEC, ["docs"]) > 0
    new_spec = SI.rebuild_spans(dest, SPEC, min_docs=1, prefix_len=3)
    assert (new_spec.min_docs, new_spec.prefix_len) == (1, 3)
    # the old contract is now the drifted one
    with pytest.raises(ValueError, match="fixed for the life"):
        SI.spans_view(dest, SPEC).collect()
    # hits were re-derived: docs 3/5 self-repeat "same batch twin",
    # visible only under min_docs=1
    docs_so_far = [d for b in BATCHES[:2] for d in b]
    batch_now = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(
            spark.createDataFrame([(d, TEXT[d]) for d in docs_so_far],
                                  "doc_id long, text string"),
            "doc_id", "text", window=4, min_docs=1).collect()
    }
    got_now = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in SI.spans_view(dest, new_spec).collect()
    }
    assert got_now == batch_now
    assert any(d == 3 for d, *_ in got_now)
    # maintenance continues under the new contract across the rebuild
    _load_batch(spark, src, BATCHES[2], start)
    assert SI.sync_spans(src, dest, new_spec, ["docs"]) > 0
    want = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(
            spark.createDataFrame(DOCS, "doc_id long, text string"),
            "doc_id", "text", window=4, min_docs=1).collect()
    }
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in SI.spans_view(dest, new_spec).collect()
    }
    assert got == want


def test_rebuild_requires_current_spec_and_legacy_width_guard(
        spark, tmp_path):
    """(a) rebuild under an already-drifted spec raises instead of
    blessing the drifted immutable window into the meta row; (b) on a
    pre-meta pool, _check_meta bootstrap-validates prefix_len against
    the stored ckey width."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load_batch(spark, src, BATCHES[0], 0)
    assert SI.sync_spans(src, dest, SPEC, ["docs"]) > 0
    drifted = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                               window=6, min_docs=2)
    with pytest.raises(ValueError, match="fixed for the life"):
        SI.rebuild_spans(dest, drifted, prefix_len=3)
    # legacy pool: same rows minus the meta row
    legacy = Pool.create(spark, str(tmp_path / "legacy"))
    legacy.load(dest.scan().filter(F.col("zed_type") != "meta"), "copy")
    wide = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                            window=4, min_docs=2, prefix_len=4)
    with pytest.raises(ValueError, match="hex chars wide"):
        SI._check_meta(legacy, wide)
    assert SI._check_meta(legacy, SPEC) is False  # right width: tolerated
