"""Multi-tenant index pools (round 7): two index families sharing ONE
pool answer identically to each family in its own pool — through syncs,
interleaved deletes, and ONE fold-compaction that serves both tenants —
and each family's probe stays bounded on the shared pool.

The storage contract that makes this safe: zed_type names are
topic-scoped (both families write 'meta', but every read filters
kafka.topic == spec.topic) and each family's key spaces carry distinct
prefixes ('t:'/'d:' text, 'w:'/'d:'-span's own topic/'f:' span, 'x:'
tombstones, 'c:' stats), so ckey-clustered files stay probe-skippable
for every tenant after the one shared rewrite."""

import pytest
import warnings

from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming import span_index as SI
from zync_spark.streaming import text_index as TI
from zync_spark.streaming.tombstones import fold_compact, read_tombs

# soak suite: excluded from the pre-commit tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _env(spark, rows, shift=0):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        F.struct(F.lit("docs").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 (F.col("doc_id") + shift).cast("long").alias("offset")
                 ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value"))


def _corpus():
    # repeated 8-token span (docs 0/1/2) + distinct tails, so the span
    # family has dup work and BM25 has term variety
    shared = "one two three four five six seven eight"
    rows = [(i, f"{shared} tail{i} alpha{i} beta{i} gamma{i} query spark")
            for i in range(3)]
    rows += [(3 + i, f"unique{i} words only here nothing shared at all "
              f"filler{i} pad{i} query") for i in range(5)]
    return rows


def _spans(dest, spec):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in SI.spans_view(dest, spec).collect())


def _hits(dest, spec):
    return sorted(
        (r["doc_id"], r["rank"], r["score"])
        for r in TI.search_text(dest, spec, ["query", "spark"],
                                k=10).collect())


def test_two_families_one_pool_equivalence(spark, tmp_path):
    rows = _corpus()
    src = Pool.create(spark, str(tmp_path / "src"))
    src.load(_env(spark, rows[:5]), "backfill")

    # single-tenant references
    t_solo = Pool.create(spark, str(tmp_path / "tsolo"))
    s_solo = Pool.create(spark, str(tmp_path / "ssolo"))
    # shared pool: both families cohabit
    shared = Pool.create(spark, str(tmp_path / "shared"))

    tspec = TI.TextIndexSpec("docs", "value.doc_id", "value.text")
    sspec = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                             window=8, min_docs=2)

    def sync_all():
        TI.sync_text(src, t_solo, tspec, ["docs"])
        SI.sync_spans(src, s_solo, sspec, ["docs"])
        TI.sync_text(src, shared, tspec, ["docs"])
        SI.sync_spans(src, shared, sspec, ["docs"])

    sync_all()
    src.load(_env(spark, rows[5:]), "delta")
    sync_all()

    assert _hits(shared, tspec) == _hits(t_solo, tspec)
    assert _spans(shared, sspec) == _spans(s_solo, sspec)
    assert len(_spans(shared, sspec)) > 0  # the dup span was found

    # interleaved deletes hit BOTH tenants (doc 1 carries the dup span)
    for dest in (shared, t_solo):
        TI.tombstone_text(dest, tspec, [4])
    for dest in (shared, s_solo):
        SI.tombstone_spans(dest, sspec, [1])
    assert _hits(shared, tspec) == _hits(t_solo, tspec)
    assert _spans(shared, sspec) == _spans(s_solo, sspec)

    # ONE fold-compaction serves both tenants
    n_before = len(shared.commits())
    # small target_rows -> several ckey-ranged output files, so the
    # boundedness assertions below measure real file skipping
    fold_compact(shared, specs=[tspec, sspec], target_rows=40)
    assert len(shared.commits()) == n_before + 1
    assert len(shared.committed_files()) > 2
    assert read_tombs(shared, tspec.topic) is None
    assert read_tombs(shared, sspec.topic) is None
    assert _hits(shared, tspec) == _hits(t_solo, tspec)
    assert _spans(shared, sspec) == _spans(s_solo, sspec)

    # probe boundedness per family on the SHARED, folded pool: a new
    # delta sync's span probe and a text search each read a strict
    # subset of the live files (the other tenant's buckets skip)
    src.load(_env(spark, [(100, "one two three four five six seven "
                           "eight fresh tail100 query")]), "more")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st: dict = {}
        SI.sync_spans(src, shared, sspec, ["docs"], stats_out=st)
        TI.sync_text(src, shared, tspec, ["docs"])
    assert 0 < st["probe_files"] < st["live_files"], st
    ts: dict = {}
    TI.search_text(shared, tspec, ["query"], k=5, stats_out=ts)
    assert 0 < ts["probe_files"] < ts["live_files"], ts
    # and the post-fold shared pool still answers like the solo pools
    SI.sync_spans(src, s_solo, sspec, ["docs"])
    TI.sync_text(src, t_solo, tspec, ["docs"])
    assert _hits(shared, tspec) == _hits(t_solo, tspec)
    assert _spans(shared, sspec) == _spans(s_solo, sspec)
