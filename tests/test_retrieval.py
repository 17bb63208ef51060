"""Unit tests for reciprocal-rank fusion (functions/retrieval.rrf_fuse).

The catalog entry hybrid_retrieval_rrf hash-checks the full composed
pipeline against a SQL replay; these pin the fusion operator itself on
hand-checkable lists: exact RRF arithmetic, absent-item semantics,
tiebreaks, >2 lists, and input validation.
"""

import pytest

from zync_spark.functions.retrieval import rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_hand_computed(spark):
    # list A ranks docs 1,2,3; list B ranks docs 3,2,9
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(3, 1), (2, 2), (9, 3)])
    out = {r["doc_id"]: r for r in
           rrf_fuse([a, b], names=["ra", "rb"], k=10, c=60).collect()}
    assert set(out) == {1, 2, 3, 9}
    # doc 2: 1/62 + 1/62; doc 3: 1/63 + 1/61; doc 1: 1/61; doc 9: 1/63
    assert out[2]["rrf"] == 1.0 / 62 + 1.0 / 62
    assert out[3]["rrf"] == 1.0 / 63 + 1.0 / 61
    assert out[1]["rrf"] == 1.0 / 61
    assert out[9]["rrf"] == 1.0 / 63
    # two-list consensus outranks any single-list item; convexity of
    # 1/x puts the (1st,3rd) doc above the (2nd,2nd) doc
    assert out[3]["rank"] == 1 and out[2]["rank"] == 2
    assert out[1]["rank"] == 3 and out[9]["rank"] == 4
    # absent-from-list ranks surface as nulls
    assert out[1]["rb"] is None and out[9]["ra"] is None
    assert out[3]["ra"] == 3 and out[3]["rb"] == 1


def test_rrf_tiebreak_by_id(spark):
    # identical contributions -> equal rrf -> order by doc_id
    a = _ranked(spark, [(7, 1), (4, 2)])
    b = _ranked(spark, [(4, 1), (7, 2)])
    rows = rrf_fuse([a, b], k=10).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [4, 7]
    assert rows[0]["rrf"] == rows[1]["rrf"]


def test_rrf_three_lists_and_k(spark):
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(2, 1), (3, 2)])
    c = _ranked(spark, [(2, 1), (4, 2)])
    rows = rrf_fuse([a, b, c], k=2).orderBy("rank").collect()
    assert len(rows) == 2
    assert rows[0]["doc_id"] == 2  # in all three lists
    assert rows[0]["rrf"] == 1.0 / 62 + 1.0 / 61 + 1.0 / 61
    # default names
    assert {"rank_1", "rank_2", "rank_3"} <= set(rows[0].asDict())


def test_rrf_differential_vs_python_reference(spark):
    """Seeded random lists vs an independent pure-Python RRF: same ids,
    same per-list ranks, same fused order, same doubles."""
    import random

    rng = random.Random(7)
    for case in range(8):
        n_lists = rng.randint(1, 4)
        c = rng.choice([10, 60])
        k = rng.randint(1, 12)
        weights = (None if case % 2 == 0 else
                   [rng.choice([0.25, 0.5, 1.0, 2.0])
                    for _ in range(n_lists)])
        lists = []
        for _ in range(n_lists):
            ids = rng.sample(range(20), rng.randint(1, 10))
            lists.append([(i, r + 1) for r, i in enumerate(ids)])
        # python reference: fixed left-to-right sum, ties by id
        scores, ranks = {}, {}
        for li, lst in enumerate(lists):
            w = 1.0 if weights is None else weights[li]
            for i, r in lst:
                scores[i] = scores.get(i, 0.0) + w / (c + r)
                ranks.setdefault(i, {})[li] = r
        expect = sorted(scores, key=lambda i: (-scores[i], i))[:k]
        out = rrf_fuse([_ranked(spark, lst) for lst in lists],
                       k=k, c=c, weights=weights).orderBy("rank").collect()
        assert [r["doc_id"] for r in out] == expect, f"case {case}"
        for row in out:
            assert row["rrf"] == scores[row["doc_id"]], f"case {case}"
            for li in range(n_lists):
                assert row[f"rank_{li + 1}"] == \
                    ranks[row["doc_id"]].get(li), f"case {case}"


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match="no rankings"):
        rrf_fuse([])
    a = _ranked(spark, [(1, 1)])
    with pytest.raises(ValueError, match="names"):
        rrf_fuse([a, a], names=["only_one"])
    # reserved/duplicate names would silently corrupt output columns
    for bad in (["rank", "x"], ["rrf", "x"], ["doc_id", "x"], ["x", "x"]):
        with pytest.raises(ValueError, match="unique and disjoint"):
            rrf_fuse([a, a], names=bad)


@pytest.mark.slow
def test_ann_recall_under_filter_monotone_and_full_probe_exact(spark, tmp_path):
    """Filtered ANN retrieval (where_ids): recall vs the exact filtered
    ground truth rises monotonically with nprobe and reaches 1.0 at full
    probe — the pre/post-filter trade is exactly nprobe, never a
    truncation artifact (the filter applies BEFORE the top-k window, so
    there is no over-fetch factor to get wrong)."""
    from pyspark.sql import functions as F

    from zync_spark.pool import Pool
    from zync_spark.streaming import ann_index as AI

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(300)
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
                           n_cells=16)
    src.load(env, "all")
    AI.sync_ann(src, dst, spec, ["emb"])
    AI.compact_ann(dst, target_rows=5000)

    where = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    qs = emb.filter(F.col("vec_id") < 8)
    exact = AI.ann_exact_topk(dst, spec, qs, k=10, where_ids=where)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert exact_pairs and all(n % 3 == 0 for _, n in exact_pairs)
    per_q = {}
    for q, _ in exact_pairs:
        per_q[q] = per_q.get(q, 0) + 1
    last = -1.0
    for nprobe in (1, 4, 16):
        got = AI.ann_query(dst, spec, qs, k=10, nprobe=nprobe,
                           where_ids=where).collect()
        assert all(r.neighbor_id % 3 == 0 for r in got)
        hits = sum((r.query_id, r.neighbor_id) in exact_pairs for r in got)
        recall = hits / len(exact_pairs)
        assert recall >= last - 1e-9, (nprobe, recall, last)
        last = recall
    assert last == 1.0  # full probe == exact filtered ground truth


def test_filtered_search_pushes_predicate_to_metadata_scan(spark, tmp_path):
    """The where_ids frame is a filtered parquet scan: the predicate
    must reach the scan (PushedFilters) and the leg must join it as a
    semi-join — never a cartesian, never a driver-side id collect."""
    from pyspark.sql import functions as F

    from zync_spark.pool import Pool
    from zync_spark.streaming import text_index as TI

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    env = docs.select(
        F.struct(F.lit("docs").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("doc_id").cast("long").alias("offset")
                 ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value"))
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    spec = TI.TextIndexSpec("d", "value.doc_id", "value.text")
    src.load(env, "all")
    TI.sync_text(src, dst, spec, ["docs"])

    where = docs.filter(F.col("lang") == "en").select("doc_id")
    out = TI.search_text(dst, spec, ["spark", "table"], k=10,
                         where_ids=where)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(lang,en)" in plan and "IsNotNull(lang)" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    # and the filter actually bites
    en = {r.doc_id for r in where.collect()}
    assert all(r.doc_id in en for r in out.collect())


@pytest.mark.slow
def test_attr_ids_colocated_filter_lifecycle(spark, tmp_path):
    """Metadata co-location (round 7): attr rows answer the filter from
    the index pool alone, track CDC updates (an update that flips the
    attribute moves the doc out of the filter), respect deletes, and
    survive the fold."""
    import pytest
    from pyspark.sql import functions as F

    from zync_spark.pool import Pool
    from zync_spark.streaming import text_index as TI
    from zync_spark.streaming.health import EmptyIndexError
    from zync_spark.streaming.tombstones import fold_compact

    rows = [(i, f"alpha beta doc{i} words here", "en" if i % 2 == 0
             else "fr") for i in range(10)]

    def env(rs, shift=0):
        df = spark.createDataFrame(rs, "doc_id long, text string, lang string")
        return df.select(
            F.struct(F.lit("docs").alias("topic"),
                     F.lit(0).cast("long").alias("partition"),
                     (F.col("doc_id") + shift).cast("long").alias("offset")
                     ).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct("doc_id", "text", "lang").alias("value"))

    spec = TI.TextIndexSpec("docs", "value.doc_id", "value.text",
                            attrs={"lang": "value.lang"})
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(env(rows), "backfill")
    TI.sync_text(src, dst, spec, ["docs"])

    ids = lambda df: sorted(r["doc_id"] for r in df.collect())  # noqa: E731
    assert ids(TI.attr_ids(dst, spec, "lang = 'en'")) == [0, 2, 4, 6, 8]
    # the filter never touches the source pool (index-resident)
    plan = TI.attr_ids(dst, spec, "lang = 'en'")._jdf \
        .queryExecution().executedPlan().toString()
    assert str(tmp_path / "src") not in plan

    # CDC update: doc 2 flips en->fr (tombstone first, republish, sync)
    TI.tombstone_text(dst, spec, [2])
    src.load(env([(2, "alpha beta doc2 words here", "fr")], shift=100),
             "update")
    TI.sync_text(src, dst, spec, ["docs"])
    assert ids(TI.attr_ids(dst, spec, "lang = 'en'")) == [0, 4, 6, 8]
    assert 2 in ids(TI.attr_ids(dst, spec, "lang = 'fr'"))

    # delete: doc 4 leaves every filter
    TI.tombstone_text(dst, spec, [4])
    assert ids(TI.attr_ids(dst, spec, "lang = 'en'")) == [0, 6, 8]

    # fold: physically reclaims, answers unchanged
    fold_compact(dst, specs=[spec])
    assert ids(TI.attr_ids(dst, spec, "lang = 'en'")) == [0, 6, 8]

    # attr-less spec fails loud (the CLI falls back to the source scan)
    bare = TI.TextIndexSpec("docs", "value.doc_id", "value.text")
    with pytest.raises(EmptyIndexError):
        TI.attr_ids(dst, bare, "lang = 'en'")


def test_attr_ids_guards_and_rebuild_survival(spark, tmp_path):
    """Round-7 review regressions: (1) rebuild_text re-buckets attr rows
    and keeps attrs on the returned spec (auto-rebuild must not kill
    co-located filtering); (2) untokenizable docs still get attr rows
    (the ANN leg must not lose them); (3) an index with pre-attrs docs
    fails LOUD instead of silently filtering to recent docs only."""
    import pytest
    from pyspark.sql import functions as F

    from zync_spark.pool import Pool
    from zync_spark.streaming import text_index as TI

    def env(rs, shift=0):
        df = spark.createDataFrame(rs, "doc_id long, text string, lang string")
        return df.select(
            F.struct(F.lit("docs").alias("topic"),
                     F.lit(0).cast("long").alias("partition"),
                     (F.col("doc_id") + shift).cast("long").alias("offset")
                     ).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct("doc_id", "text", "lang").alias("value"))

    spec = TI.TextIndexSpec("docs", "value.doc_id", "value.text",
                            attrs={"lang": "value.lang"})
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    # doc 3 is untokenizable (empty text) but carries metadata — it may
    # still live in the ANN index and must pass the filter
    rows = [(0, "alpha beta gamma", "en"), (1, "delta eps zeta", "fr"),
            (2, "eta theta iota", "en"), (3, "", "en")]
    src.load(env(rows), "all")
    TI.sync_text(src, dst, spec, ["docs"])

    ids = lambda p: sorted(  # noqa: E731
        r["doc_id"] for r in TI.attr_ids(dst, spec, p).collect())
    assert ids("lang = 'en'") == [0, 2, 3]  # 3: no tokens, still covered

    # rebuild re-buckets attrs and the returned spec keeps them
    new = TI.rebuild_text(dst, spec, prefix_len=3)
    assert new.attrs == spec.attrs
    assert sorted(
        r["doc_id"] for r in TI.attr_ids(dst, new, "lang = 'en'")
        .collect()) == [0, 2, 3]

    # partial coverage fails loud: a pre-attrs index + one attrs sync
    bare = TI.TextIndexSpec("docs", "value.doc_id", "value.text")
    dst2 = Pool.create(spark, str(tmp_path / "idx2"))
    src.load(env([(10, "kappa lambda mu", "en")], shift=50), "later")
    TI.sync_text(src, dst2, bare, ["docs"])          # no attr rows
    withattrs = TI.TextIndexSpec("docs", "value.doc_id", "value.text",
                                 attrs={"lang": "value.lang"})
    src.load(env([(11, "nu xi omicron", "en")], shift=100), "newest")
    TI.sync_text(src, dst2, withattrs, ["docs"])     # attr rows for 11 only
    with pytest.raises(ValueError, match="predates"):
        TI.attr_ids(dst2, withattrs, "lang = 'en'")


def test_health_opts_pool_vacuum_key_no_collision(spark, tmp_path):
    """health_opts['pool'] is arbitrary check_pool_health kwargs — an
    explicit vacuum_after_s must override the loop knob, not TypeError
    the ingest loop (round-7 review)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from zync_spark.pool import Pool
    from zync_spark.streaming import dedup_index as DI
    from zync_spark.streaming.from_kafka import FromKafka

    spec = DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                             k=3, num_hashes=16, bands=4, threshold=0.5)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src.load(df.select(
        F.struct(F.lit("docs").alias("topic"),
                 F.lit(0).cast("long").alias("partition"),
                 F.col("doc_id").cast("long").alias("offset")).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value")), "all")
    DI.sync_index(src, dst, spec, ["docs"])

    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"docs": src}, sub, sub, format="json",
                   indexes=[(spec, dst, ["docs"])], health_every=1,
                   health_opts={"pool": {"vacuum_after_s": 60.0,
                                         "max_masked_fraction": 0.5}})
    verdicts = fk._run_health_checks()  # must not TypeError
    pool_v = [v for v in verdicts if v["family"] == "pool"]
    assert pool_v and pool_v[0]["unreferenced_files"] is not None
