"""Tombstone (update/delete) propagation across the four index families
(streaming/tombstones.py).

The invariant under test, per family: after ANY interleaving of
inserts, updates (tombstone-then-republish), and deletes, every view /
search answers IDENTICALLY to the batch operator (or a fresh index) run
over the LATEST-state corpus — and folding the tombstones physically at
compaction/rebuild changes no answer while removing every machinery row
(tomb / undup / unhit) and every masked row from storage.
"""

import pytest
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming import ann_index as AI
from zync_spark.streaming import dedup_index as DI
from zync_spark.streaming import span_index as SI
from zync_spark.streaming import text_index as TI


def _env(spark, rows, part=0, topic="docs", schema="doc_id long, text string",
         fields=("doc_id", "text"), off="doc_id"):
    df = spark.createDataFrame(rows, schema)
    return df.select(
        F.struct(
            F.lit(topic).alias("topic"),
            F.lit(part).cast("long").alias("partition"),
            F.col(off).cast("long").alias("offset"),
        ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct(*fields).alias("value"),
    )


def _no_machinery(dest, extra=()):
    st = dest.scan()
    for zt in ("tomb", "undup", "unhit") + tuple(extra):
        assert st.filter(F.col("zed_type").eqNullSafe(zt)).count() == 0, zt


# ---------------------------------------------------------------- text


TEXT_ROWS = [
    (1, "spark query engine"),
    (2, "query the spark table"),
    (3, "a table of data"),
    (4, "spark spark spark"),
    (5, "unrelated words entirely"),
]
TERMS = ["spark", "table", "query"]
TSPEC = TI.TextIndexSpec("docs", "value.doc_id", "value.text")


def _bm25_fresh(spark, tmp_path, tag, live):
    src = Pool.create(spark, str(tmp_path / f"ref{tag}/src"))
    dst = Pool.create(spark, str(tmp_path / f"ref{tag}/idx"))
    src.load(_env(spark, live), "all")
    TI.sync_text(src, dst, TSPEC, ["docs"])
    return [(r.doc_id, r.rank, r.score)
            for r in TI.search_text(dst, TSPEC, TERMS).collect()]


@pytest.mark.slow
def test_text_delete_update_matches_fresh_index(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, TEXT_ROWS), "all")
    TI.sync_text(src, dst, TSPEC, ["docs"])

    # delete 2 and 4: scores (incl. df and corpus stats) must equal a
    # fresh index over the surviving docs
    TI.tombstone_text(dst, TSPEC, [2, 4])
    live = [r for r in TEXT_ROWS if r[0] not in (2, 4)]
    got = [(r.doc_id, r.rank, r.score)
           for r in TI.search_text(dst, TSPEC, TERMS).collect()]
    assert got == _bm25_fresh(spark, tmp_path, "a", live)

    # update doc 1 + re-insert doc 2 (tombstone FIRST, then republish)
    TI.tombstone_text(dst, TSPEC, [1, 2])
    upd = [(1, "table query table"), (2, "spark again")]
    src.load(_env(spark, upd, part=1), "updates")
    TI.sync_text(src, dst, TSPEC, ["docs"])
    live = [upd[0], upd[1], TEXT_ROWS[2], TEXT_ROWS[4]]
    want = _bm25_fresh(spark, tmp_path, "b", live)
    got = [(r.doc_id, r.rank, r.score)
           for r in TI.search_text(dst, TSPEC, TERMS).collect()]
    assert got == want

    # negative cstat partials keep the corpus stats EXACT
    n, s = TI.corpus_stats(dst, TSPEC)
    assert (n, s) == (4, sum(len(t.split()) for _, t in live))

    # deleting an absent / already-deleted id subtracts nothing
    TI.tombstone_text(dst, TSPEC, [4, 999])
    assert TI.corpus_stats(dst, TSPEC) == (n, s)

    # fold: machinery rows gone, masked rows gone, answers unchanged
    TI.compact_text(dst, target_rows=2000)
    _no_machinery(dst)
    st = dst.scan()
    assert st.filter(F.col("zed_type").eqNullSafe("post")
                     & (F.col("doc_id") == 4)).count() == 0
    assert [(r.doc_id, r.rank, r.score)
            for r in TI.search_text(dst, TSPEC, TERMS).collect()] == want
    assert TI.corpus_stats(dst, TSPEC) == (n, s)

    # rebuild folds too and keeps parity under the new fan-out
    TI.tombstone_text(dst, TSPEC, [5])
    spec2 = TI.rebuild_text(dst, TSPEC, prefix_len=3)
    _no_machinery(dst)
    live2 = [r for r in live if r[0] != 5]
    assert [(r.doc_id, r.rank, r.score)
            for r in TI.search_text(dst, spec2, TERMS).collect()] \
        == _bm25_fresh(spark, tmp_path, "c", live2)


# --------------------------------------------------------------- dedup


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "tonight")
DEDUP_ROWS = [
    (1, BASE),
    (2, BASE + " extra"),
    (3, "completely different text about spark engines and data"),
    (4, BASE),
    (5, "another unrelated string of words for testing purposes only"),
]
DSPEC = DI.DedupIndexSpec("d", "value.doc_id", "value.text")


def _pairs_fresh(spark, tmp_path, tag, live):
    src = Pool.create(spark, str(tmp_path / f"dref{tag}/src"))
    dst = Pool.create(spark, str(tmp_path / f"dref{tag}/idx"))
    src.load(_env(spark, live), "all")
    DI.sync_index(src, dst, DSPEC, ["docs"])
    return sorted((r.id_a, r.id_b, round(r.jaccard, 9))
                  for r in DI.pairs_view(dst, DSPEC).collect())


def _pairs(dst, spec):
    return sorted((r.id_a, r.id_b, round(r.jaccard, 9))
                  for r in DI.pairs_view(dst, spec).collect())


@pytest.mark.slow
def test_dedup_delete_update_matches_fresh_index(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, DEDUP_ROWS), "all")
    DI.sync_index(src, dst, DSPEC, ["docs"])
    assert len(_pairs(dst, DSPEC)) >= 3  # 1~2, 1~4, 2~4 at least

    # delete doc 1: every pair with member 1 dies; (2,4) survives
    DI.tombstone_index(dst, DSPEC, [1])
    live = [r for r in DEDUP_ROWS if r[0] != 1]
    assert _pairs(dst, DSPEC) == _pairs_fresh(spark, tmp_path, "a", live)

    # update doc 2 to near-dup doc 3; re-insert doc 1 verbatim — the
    # sync must re-discover 1's pairs against the LIVE index only
    DI.tombstone_index(dst, DSPEC, [2])
    upd = [(2, DEDUP_ROWS[2][1] + " stuff"), (1, BASE)]
    src.load(_env(spark, upd, part=1), "updates")
    DI.sync_index(src, dst, DSPEC, ["docs"])
    live = [(1, BASE), upd[0], DEDUP_ROWS[2], DEDUP_ROWS[3], DEDUP_ROWS[4]]
    want = _pairs_fresh(spark, tmp_path, "b", live)
    assert _pairs(dst, DSPEC) == want

    # index_view masks to exactly the live versions
    assert sorted(r.doc_id for r in DI.index_view(dst, DSPEC).collect()) \
        == [1, 2, 3, 4, 5]

    # fold keeps answers, drops machinery + masked rows
    DI.compact_index(dst, spec=DSPEC)
    _no_machinery(dst)
    assert _pairs(dst, DSPEC) == want
    # bounded pairs_view(ids=) still masks correctly
    sub = DI.pairs_view(dst, DSPEC, ids=[1, 2, 4])
    assert all(r.id_a in (1, 2, 4) for r in sub.collect())

    # rebuild folds a pending tombstone and keeps parity
    DI.tombstone_index(dst, DSPEC, [4])
    spec2 = DI.rebuild_index(dst, DSPEC, prefix_len=3)
    _no_machinery(dst)
    live2 = [r for r in live if r[0] != 4]
    assert _pairs(dst, spec2) == _pairs_fresh(spark, tmp_path, "c", live2)


# ---------------------------------------------------------------- span


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-window
TAIL = "iota kappa lam mu nu xi omicron pi"
SPAN_ROWS = [
    (1, f"{SHARED} one unique ending here for doc one {TAIL}"),
    (2, f"{SHARED} totally different middle section words {TAIL}"),
    (3, "no overlap at all just some plain filler text for three"),
    (4, f"intro words then {SHARED} and then a private conclusion"),
]
SSPEC = SI.SpanIndexSpec("s", "value.doc_id", "value.text",
                         window=8, min_docs=2)


def _batch_spans(spark, live):
    from zync_spark.functions.dedup import duplicate_spans

    df = spark.createDataFrame(live, "doc_id long, text string")
    out = duplicate_spans(df, "doc_id", "text", window=8, min_docs=2)
    return sorted((r.doc_id, r.span_start, r.span_end)
                  for r in out.collect())


def _view(dst, spec):
    return sorted((r.doc_id, r.span_start, r.span_end)
                  for r in SI.spans_view(dst, spec).collect())


@pytest.mark.slow
def test_span_delete_retracts_surviving_docs_duplication(spark, tmp_path):
    """THE hard delete semantics: removing one copy of a twice-occurring
    span must un-duplicate the other copy — spans_view == the batch
    operator over the latest corpus at every step."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, SPAN_ROWS[:2]), "b1")
    SI.sync_spans(src, dst, SSPEC, ["docs"])
    src.load(_env(spark, SPAN_ROWS[2:], part=1), "b2")
    SI.sync_spans(src, dst, SSPEC, ["docs"])
    assert _view(dst, SSPEC) == _batch_spans(spark, SPAN_ROWS)

    # delete doc 2: doc 1's TAIL span loses its only partner and must
    # be retracted; its SHARED span survives via doc 4
    SI.tombstone_spans(dst, SSPEC, [2])
    live = [r for r in SPAN_ROWS if r[0] != 2]
    assert _view(dst, SSPEC) == _batch_spans(spark, live)

    # delete doc 4 too: the SHARED window is now unique to doc 1
    SI.tombstone_spans(dst, SSPEC, [4])
    live = [SPAN_ROWS[0], SPAN_ROWS[2]]
    assert _view(dst, SSPEC) == _batch_spans(spark, live)

    # re-insert doc 2: the retracted hashes re-dup at a later seq and
    # hits re-emit for EVERY live occurrence (incl. doc 1's stored ones)
    src.load(_env(spark, [SPAN_ROWS[1]], part=2), "reinsert")
    SI.sync_spans(src, dst, SSPEC, ["docs"])
    live = [SPAN_ROWS[0], SPAN_ROWS[1], SPAN_ROWS[2]]
    assert _view(dst, SSPEC) == _batch_spans(spark, live)

    # update doc 1 (tombstone first, then republish)
    SI.tombstone_spans(dst, SSPEC, [1])
    new1 = (1, "completely fresh words with zero shared windows at all")
    src.load(_env(spark, [new1], part=3), "update1")
    SI.sync_spans(src, dst, SSPEC, ["docs"])
    live = [new1, SPAN_ROWS[1], SPAN_ROWS[2]]
    want = _batch_spans(spark, live)
    assert _view(dst, SSPEC) == want

    # fold: machinery gone, masked wins gone, answers unchanged
    SI.compact_spans(dst, target_rows=5000)
    _no_machinery(dst)
    st = dst.scan()
    # doc 2's windows exist exactly once (the re-insert), doc 4's none
    assert st.filter(F.col("zed_type").eqNullSafe("win")
                     & (F.col("doc_id") == 4)).count() == 0
    assert _view(dst, SSPEC) == want

    # rebuild keeps parity, regenerates the forward space; deletes
    # still work afterwards
    spec2 = SI.rebuild_spans(dst, SSPEC, prefix_len=3)
    assert _view(dst, spec2) == want
    SI.tombstone_spans(dst, spec2, [2])
    live2 = [new1, SPAN_ROWS[2]]
    assert _view(dst, spec2) == _batch_spans(spark, live2)


@pytest.mark.slow
def test_span_delete_requires_forward_space(spark, tmp_path):
    """A pool whose meta predates the forward key space must refuse
    deletes loudly and point at rebuild_spans (which regenerates 'f:'
    rows from the stored windows)."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, SPAN_ROWS[:2]), "b1")
    SI.sync_spans(src, dst, SSPEC, ["docs"])

    # simulate a legacy pool: rewrite the meta row without `forward`
    def _strip_forward(df):
        legacy = df.sparkSession.createDataFrame(
            [(SSPEC.window, SSPEC.min_docs, SSPEC.prefix_len)],
            "window long, min_docs long, prefix_len long").select(
            F.struct(F.lit(SSPEC.topic).alias("topic"),
                     F.lit(-2).cast("long").alias("partition"),
                     F.monotonically_increasing_id().alias("offset")
                     ).alias("kafka"),
            F.lit("meta").alias("zed_type"), F.lit("c:").alias("ckey"),
            "window", "min_docs", "prefix_len")
        keep = df.filter(~F.col("zed_type").eqNullSafe("meta"))
        return keep.unionByName(legacy, allowMissingColumns=True) \
            .drop("forward")

    dst.compact(transform=_strip_forward, cluster_by=["ckey"])
    with pytest.raises(ValueError, match="forward"):
        SI.tombstone_spans(dst, SSPEC, [1])
    # rebuild_spans grants the capability
    SI.rebuild_spans(dst, SSPEC)
    SI.tombstone_spans(dst, SSPEC, [2])
    assert _view(dst, SSPEC) == _batch_spans(spark, SPAN_ROWS[:1])


@pytest.mark.slow
def test_span_tombstone_probe_is_bounded(spark, tmp_path):
    """The delete pass reads only the dying docs' forward buckets plus
    their hashes' w:/d: buckets — not the whole index."""
    rows = [(i, f"unique{i} text piece number {i} with private words "
                f"aa{i} bb{i} cc{i} dd{i} ee{i} ff{i} gg{i}")
            for i in range(40)]
    rows += SPAN_ROWS[:2]
    spec = SI.SpanIndexSpec("s", "value.doc_id", "value.text",
                            window=8, min_docs=2, prefix_len=2)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, rows), "all")
    SI.sync_spans(src, dst, spec, ["docs"])
    SI.compact_spans(dst, target_rows=50)  # many small clustered files
    stats = {}
    SI.tombstone_spans(dst, spec, [2], stats_out=stats)
    assert stats["probe_files"] < stats["live_files"], stats


# ----------------------------------------------------------------- ann


@pytest.mark.slow
def test_ann_delete_masks_and_folds(spark, tmp_path):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(200)
    env = emb.select(
        F.struct(F.lit("emb").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("vec_id").cast("long").alias("offset")
                 ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("vec_id", "embedding").alias("value"))
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    spec = AI.AnnIndexSpec("e", "value.vec_id", "value.embedding",
                           n_cells=4)
    src.load(env, "all")
    AI.sync_ann(src, dst, spec, ["emb"])
    AI.compact_ann(dst, target_rows=2000)
    qs = emb.filter(F.col("vec_id") < 3)
    before = AI.ann_query(dst, spec, qs, k=5, nprobe=4).collect()
    victims = sorted({r.neighbor_id for r in before})[:4]

    AI.tombstone_ann(dst, spec, victims)
    after = AI.ann_query(dst, spec, qs, k=5, nprobe=4).collect()
    assert not any(r.neighbor_id in victims for r in after)
    exact = AI.ann_exact_topk(dst, spec, qs, k=5).collect()
    assert not any(r.neighbor_id in victims for r in exact)

    # fold: tombs + masked vecs leave, answers unchanged
    AI.compact_ann(dst, target_rows=2000)
    st = dst.scan()
    assert st.filter(F.col("zed_type").eqNullSafe("tomb")).count() == 0
    assert st.filter(F.col("zed_type").eqNullSafe("vec")
                     & F.col("vec_id").isin(victims)).count() == 0
    after2 = AI.ann_query(dst, spec, qs, k=5, nprobe=4).collect()
    assert sorted((r.query_id, r.neighbor_id) for r in after2) \
        == sorted((r.query_id, r.neighbor_id) for r in after)

    # rebuild folds a pending tombstone before retraining
    AI.tombstone_ann(dst, spec, [199])
    AI.rebuild_ann(dst, spec)
    st = dst.scan()
    assert st.filter(F.col("zed_type").eqNullSafe("tomb")).count() == 0
    assert st.filter(F.col("zed_type").eqNullSafe("vec")
                     & (F.col("vec_id") == 199)).count() == 0


def test_mask_rows_seq_semantics(spark):
    """The core masking rule in isolation: a row is dead iff a tombstone
    for its id is LATER than the row's commit seq — re-inserts live."""
    from zync_spark.streaming.tombstones import mask_rows

    rows = spark.createDataFrame(
        [((u, 1, 0), i) for i, u in [(1, 0), (1, 5), (2, 3), (3, -2)]],
        "kafka struct<partition:long,topic:long,offset:long>, id long")
    # tombstone: id=1 upto 4, id=3 upto 1
    tombs = spark.createDataFrame([(1, 4), (3, 1)], "did long, __upto long")
    got = sorted((r.id, r.kafka.partition)
                 for r in mask_rows(rows, tombs, "id").collect())
    # id=1@0 dead, id=1@5 live (re-insert), id=2 untombstoned, id=3@-2
    # (rebuild label) dead
    assert got == [(1, 5), (2, 3)]
    # tombs=None is the fast path: frame unchanged
    assert mask_rows(rows, None, "id") is rows


# ------------------------------------------------------------- upserts


@pytest.mark.slow
def test_text_upsert_sync_one_call_cdc(spark, tmp_path):
    """sync_text(upsert=True): re-published doc_ids replace their old
    posting sets in ONE commit — search and corpus stats match a fresh
    index over the latest corpus, and within-batch duplicates collapse
    to the highest offset."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, TEXT_ROWS), "all")
    TI.sync_text(src, dst, TSPEC, ["docs"], upsert=True)

    # re-publish docs 1 and 4 with new text, plus TWO in-batch versions
    # of doc 2 (offsets 102 then 107 — the later one must win)
    upd = [(1, "table query table"), (4, "nothing relevant here")]
    env2 = _env(spark, upd, part=0).withColumn(
        "kafka", F.struct(
            F.col("kafka.topic").alias("topic"),
            F.col("kafka.partition").alias("partition"),
            (F.col("kafka.offset") + 100).alias("offset")))
    dup2 = _env(spark, [(2, "stale version"), (2, "spark query final")])
    dup2 = dup2.withColumn(
        "kafka", F.struct(
            F.col("kafka.topic").alias("topic"),
            F.col("kafka.partition").alias("partition"),
            (F.col("kafka.offset") + F.when(
                F.col("value.text") == "stale version",
                F.lit(100)).otherwise(F.lit(105))).alias("offset")))
    src.load(env2.unionByName(dup2), "updates")
    TI.sync_text(src, dst, TSPEC, ["docs"], upsert=True)

    live = [upd[0], (2, "spark query final"), TEXT_ROWS[2], upd[1],
            TEXT_ROWS[4]]
    got = [(r.doc_id, r.rank, r.score)
           for r in TI.search_text(dst, TSPEC, TERMS).collect()]
    assert got == _bm25_fresh(spark, tmp_path, "u", live)
    assert TI.corpus_stats(dst, TSPEC) == (
        5, sum(len(t.split()) for _, t in live))
    # rerun is still a no-op
    assert TI.sync_text(src, dst, TSPEC, ["docs"], upsert=True) == 0


@pytest.mark.slow
def test_dedup_upsert_sync_one_call_cdc(spark, tmp_path):
    """sync_index(upsert=True): a re-published near-duplicate's pairs
    re-derive against the LIVE index only — never against the version
    it supersedes."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, DEDUP_ROWS), "all")
    DI.sync_index(src, dst, DSPEC, ["docs"], upsert=True)

    # doc 2 becomes a near-dup of doc 3 instead of doc 1/4
    upd = [(2, DEDUP_ROWS[2][1] + " stuff")]
    env2 = _env(spark, upd).withColumn(
        "kafka", F.struct(
            F.col("kafka.topic").alias("topic"),
            F.col("kafka.partition").alias("partition"),
            (F.col("kafka.offset") + 100).alias("offset")))
    src.load(env2, "upd")
    DI.sync_index(src, dst, DSPEC, ["docs"], upsert=True)
    live = [DEDUP_ROWS[0], upd[0], DEDUP_ROWS[2], DEDUP_ROWS[3],
            DEDUP_ROWS[4]]
    assert _pairs(dst, DSPEC) == _pairs_fresh(spark, tmp_path, "u", live)
    assert DI.sync_index(src, dst, DSPEC, ["docs"], upsert=True) == 0


@pytest.mark.slow
def test_span_upsert_sync_retracts_in_one_commit(spark, tmp_path):
    """sync_spans(upsert=True): superseding the only partner of a
    duplicated span retracts the survivor's span in the SAME commit —
    and a later re-publish re-duplicates it."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, SPAN_ROWS), "all")
    SI.sync_spans(src, dst, SSPEC, ["docs"], upsert=True)
    assert _view(dst, SSPEC) == _batch_spans(spark, SPAN_ROWS)

    # doc 2 loses both shared regions; doc 4 loses SHARED too — doc 1's
    # TAIL span must retract (partner gone) while SHARED survives only
    # until doc 4's update lands in the same batch
    upd = [(2, "entirely new content with no shared windows anywhere"),
           (4, "also completely rewritten private text for doc four")]
    env2 = _env(spark, upd).withColumn(
        "kafka", F.struct(
            F.col("kafka.topic").alias("topic"),
            F.col("kafka.partition").alias("partition"),
            (F.col("kafka.offset") + 100).alias("offset")))
    src.load(env2, "upd")
    SI.sync_spans(src, dst, SSPEC, ["docs"], upsert=True)
    live = [SPAN_ROWS[0], upd[0], SPAN_ROWS[2], upd[1]]
    assert _view(dst, SSPEC) == _batch_spans(spark, live)

    # re-publish doc 2's ORIGINAL text: the retracted rules re-satisfy
    env3 = _env(spark, [SPAN_ROWS[1]]).withColumn(
        "kafka", F.struct(
            F.col("kafka.topic").alias("topic"),
            F.col("kafka.partition").alias("partition"),
            (F.col("kafka.offset") + 200).alias("offset")))
    src.load(env3, "repub")
    SI.sync_spans(src, dst, SSPEC, ["docs"], upsert=True)
    live = [SPAN_ROWS[0], SPAN_ROWS[1], SPAN_ROWS[2], upd[1]]
    assert _view(dst, SSPEC) == _batch_spans(spark, live)
    # fold keeps the answers
    SI.compact_spans(dst, target_rows=5000)
    _no_machinery(dst)
    assert _view(dst, SSPEC) == _batch_spans(spark, live)


def test_ann_upsert_sync_one_call_cdc(spark, tmp_path):
    """sync_ann(upsert=True): a re-published embedding replaces its old
    vector (old one masked, new one re-assigned against the frozen
    centroids)."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(100)
    def env(df, shift=0):
        return df.select(
            F.struct(F.lit("emb").alias("topic"),
                     F.lit(0).cast("long").alias("partition"),
                     (F.col("vec_id") + F.lit(shift)).cast("long")
                     .alias("offset")).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct("vec_id", "embedding").alias("value"))
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    spec = AI.AnnIndexSpec("e", "value.vec_id", "value.embedding",
                           n_cells=4)
    src.load(env(emb), "all")
    AI.sync_ann(src, dst, spec, ["emb"], upsert=True)
    # negate vectors 5..9 and re-publish
    upd = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)) \
        .select("vec_id",
                F.transform("embedding", lambda x: -x).alias("embedding"))
    src.load(env(upd, shift=1000), "upd")
    AI.sync_ann(src, dst, spec, ["emb"], upsert=True)
    # exactly one live vec row per id, and ids 5..9 carry negated values
    from zync_spark.streaming.tombstones import mask_rows, read_tombs
    live = mask_rows(dst.scan().filter(F.col("zed_type") == "vec"),
                     read_tombs(dst, spec.topic), "vec_id")
    counts = live.groupBy("vec_id").count().filter("count > 1").count()
    assert counts == 0
    v5 = live.filter(F.col("vec_id") == 5).select("v").collect()[0][0]
    orig5 = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    assert abs(v5[0] + float(orig5[0])) < 1e-9
    assert AI.sync_ann(src, dst, spec, ["emb"], upsert=True) == 0


def test_upsert_refuses_cross_partition_versions(spark, tmp_path):
    """Round-6 review regression: within one upsert batch, the same id
    on two partitions has no version order (offsets are per-partition
    sequences) — the sync must refuse instead of indexing an arbitrary
    version."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    rows0 = _env(spark, [(1, "version from partition zero")], part=0)
    rows1 = _env(spark, [(1, "version from partition one")], part=1)
    src.load(rows0.unionByName(rows1), "both")
    with pytest.raises(ValueError, match="multiple partitions"):
        TI.sync_text(src, dst, TSPEC, ["docs"], upsert=True)
    # non-upsert append-only ingest of the same batch is still legal
    assert TI.sync_text(src, dst, TSPEC, ["docs"]) > 0
