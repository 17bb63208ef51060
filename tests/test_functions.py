"""Unit tests for the LLM-pipeline operator library on tiny in-memory data."""

import pytest

from pyspark.sql import functions as F

from zync_spark.functions import dedup as D
from zync_spark.functions import multimodal as M
from zync_spark.functions import similarity as S
from zync_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different text with no overlap at all here"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = {r["canonical_id"]: r["n_dups"] for r in D.exact_duplicates(docs, "doc_id", "text").collect()}
    assert groups[1] == 2       # docs 1 and 4
    assert groups[2] == 1 and groups[3] == 1


def test_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.3).collect()}
    assert pairs[(1, 4)] == 1.0                  # identical
    assert 0.3 <= pairs[(1, 2)] < 1.0            # near-dup
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.3).collect()}
    assert (1, 4) in pairs
    assert (1, 2) in pairs


def test_simhash_near_dups_closer(docs):
    h = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "doc_id", "text").collect()}
    assert h[1] == h[4]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[1], h[2]) < ham(h[1], h[3])
    assert all(0 <= v < 2**60 for v in h.values())


def test_text_functions(docs):
    row = docs.filter(F.col("doc_id") == 1).select(
        TX.token_count(F.col("text")).alias("n"),
        TX.stopword_count(TX.tokens(F.col("text"))).alias("sw"),
        TX.fingerprint(TX.tokens(F.col("text"))).alias("fp"),
        TX.quality_score(F.col("text")).alias("q"),
    ).collect()[0]
    assert row["n"] == 9
    assert row["sw"] == 2          # two "the"
    assert 0 <= row["fp"] < 2147483647
    assert 0.0 <= row["q"] <= 1.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a")], "doc_id long, text string"
    )
    fps = [r[0] for r in df.select(TX.fingerprint(TX.tokens(F.col("text")))).collect()]
    assert fps[0] != fps[1]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [0.0, 0.98, 0.05, 0.0]),  # close to 2
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(vectors):
    res = S.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=2).collect()
    by_rank = {r["rank"]: r["neighbor_id"] for r in res}
    assert by_rank[1] == 1        # nearest neighbor of 0 is 1
    assert len(res) == 2


def test_cosine_topk_schema_stable_across_size_gate(vectors, tmp_path):
    """Output column ORDER must not vary with corpus size (round-8
    ADVICE): the small-corpus one-window path and the two-stage scale
    path must return the identical ordered schema."""
    q = vectors.filter(F.col("vec_id") == 0)
    big = S.cosine_topk(vectors, q, k=2)       # non-file frame: scale path
    p = str(tmp_path / "vecs.parquet")
    vectors.write.parquet(p)
    filed = vectors.sparkSession.read.parquet(p)   # < 4 MB: small path
    small = S.cosine_topk(filed, q, k=2)
    assert small.columns == big.columns == [
        "query_id", "neighbor_id", "rank", "cos"]
    assert ({(r["rank"], r["neighbor_id"]) for r in small.collect()}
            == {(r["rank"], r["neighbor_id"]) for r in big.collect()})


def test_embedding_neardup(vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(vectors, "vec_id", "embedding",
                                       threshold=0.95, bucket_bits=0).collect()}
    assert (0, 1) in pairs and (2, 3) in pairs
    assert (0, 2) not in pairs


def test_multimodal_decode_stub(docs):
    media = M.attach_media(docs, "doc_id", "text")
    feats = M.decode_media(media, fake_features=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 4
    r1, r4 = rows[1], rows[4]
    assert r1["digest"] == r4["digest"]            # same payload → same digest
    assert r1["feat0"] == r4["feat0"]
    assert all(0.0 <= rows[i][f"feat{j}"] < 1.0 for i in rows for j in range(4))
    assert rows[3]["digest"] != r1["digest"]


def test_multimodal_decode_without_codecs_raises(docs):
    media = M.attach_media(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        M.decode_media(media, fake_features=False).collect()


# -- temporal joins (functions/joins.py) ------------------------------------


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic_and_tolerance(spark):
    from zync_spark.functions.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00")),
         (2, 1, _ts("2024-01-01 10:10:00")),
         (3, 2, _ts("2024-01-01 10:05:00"))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts("2024-01-01 09:59:00")),
         (101, 1, _ts("2024-01-01 10:00:00")),   # equal ts: inclusive match
         (102, 1, _ts("2024-01-01 10:07:00")),
         (103, 3, _ts("2024-01-01 09:00:00"))],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["id"]: (r["matched"]["rid"] if r["matched"] else None)
        for r in asof_join(left, right, on="k", left_time="ts").collect()
    }
    assert out == {1: 101, 2: 102, 3: None}

    # tolerance: id=2's match at 10:07 is 180s old; a 60s tolerance drops it
    out_tol = {
        r["id"]: (r["matched"]["rid"] if r["matched"] else None)
        for r in asof_join(
            left, right, on="k", left_time="ts", tolerance_seconds=60
        ).collect()
    }
    assert out_tol == {1: 101, 2: None, 3: None}


def test_interval_join_inner_and_right(spark):
    from pyspark.sql import functions as F

    from zync_spark.functions.joins import interval_join

    points = spark.createDataFrame(
        [(1, 10, 95.0), (1, 11, 150.0), (2, 12, 50.0)],
        "k long, pid long, x double",
    ).select("k", "pid", F.timestamp_seconds("x").alias("ts"))
    intervals = spark.createDataFrame(
        [(1, 100, 90.0, 120.0),   # catches x=95 (and not 150: hi exclusive would, 150>120)
         (1, 101, 140.0, 160.0),  # catches x=150, crosses bucket boundary
         (2, 102, 200.0, 230.0)], # no points
        "k long, iid long, lo_s double, hi_s double",
    ).select(
        "k", "iid",
        F.timestamp_seconds("lo_s").alias("lo"),
        F.timestamp_seconds("hi_s").alias("hi"),
    )
    inner = interval_join(
        points, intervals, on="k", point_time="ts", lo="lo", hi="hi",
        bucket_seconds=30,
    )
    got = sorted((r["iid"], r["pid"]) for r in inner.collect())
    assert got == [(100, 10), (101, 11)]

    right = interval_join(
        points, intervals, on="k", point_time="ts", lo="lo", hi="hi",
        bucket_seconds=30, how="right",
    )
    per_iv = {}
    for r in right.collect():
        per_iv.setdefault(r["iid"], []).append(r["pid"])
    assert per_iv == {100: [10], 101: [11], 102: [None]}


def test_multimodal_resize_and_frames(spark):
    from pyspark.sql import functions as F

    from zync_spark.functions.multimodal import (
        attach_media,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another payload")], "id long, text string"
    )
    media = attach_media(df, "id", "text", "image/fake")

    resized = resize_images(media, width=8, height=4, fake=True).collect()
    assert {r["media_id"] for r in resized} == {1, 2}
    assert all(r["n_bytes"] == 32 and len(r["payload"]) == 32 for r in resized)
    assert all(r["width"] == 8 and r["height"] == 4 for r in resized)
    # deterministic across runs
    again = resize_images(media, width=8, height=4, fake=True).collect()
    assert {r["media_id"]: r["digest"] for r in resized} == {
        r["media_id"]: r["digest"] for r in again
    }

    frames = sample_frames(media, n_frames=3, frame_ms=100, fake=True).collect()
    assert len(frames) == 6  # 1→N explode
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    assert all(sorted(v) == [(0, 0), (1, 100), (2, 200)] for v in by_media.values())

    # the real-codec path is an explicit stub
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        resize_images(media, width=8, height=4, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "not available" in str(ei.value)


def test_ann_variants_beat_random_sampling(spark):
    """IVF and LSH are approximate, but on deterministic inputs their
    recall@5 must beat the fraction of the corpus they scan (else the
    index adds nothing over random sampling). IVF probes 2/16
    k-means-trained cells (~12.5% scanned; measured recall 0.30 on this
    corpus — the bound asserts 2x the scanned fraction so a regression to
    sampling-quality centroids fails); LSH nbits=4 buckets scan ~1/16."""
    from pyspark.sql import functions as F

    import zync_spark.functions.similarity as S
    from zync_spark.queries import T

    emb = T(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"]) for r in S.cosine_topk(emb, q, k=5).collect()}
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_ann_topk(emb, q, k=5, n_cells=16, nprobe=2).collect()
    }
    lsh = {(r["query_id"], r["neighbor_id"]) for r in S.lsh_ann_topk(emb, q, k=5, nbits=4).collect()}
    assert len(exact) == 50
    assert len(ivf & exact) / len(exact) >= 0.25
    assert len(lsh & exact) / len(exact) > 0.0625


def test_emb_neardup_lsh_subset_of_exact(spark):
    """The bucketed near-dup path may only MISS pairs (bucket boundary),
    never invent them: its output must be a subset of the exact all-pairs
    result with the same threshold, with nonzero recall, and its join
    must be bucket-keyed (no full cross product)."""
    from pyspark.sql import functions as F

    from zync_spark.functions.dedup import embedding_neardup_pairs
    from zync_spark.queries import T

    emb = T(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            emb, "vec_id", "embedding", 0.45, bucket_bits=0).collect()
    }
    lsh_df = embedding_neardup_pairs(
        emb, "vec_id", "embedding", 0.45, bucket_bits=4
    )
    lsh = {(r["id_a"], r["id_b"]) for r in lsh_df.collect()}
    assert exact, "threshold yields no pairs — test is vacuous"
    assert lsh <= exact
    assert len(lsh) / len(exact) > 1 / 16  # beats random bucket assignment
    plan = lsh_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from zync_spark.functions.joins import salted_join

    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(1000)], "id long, k string"
    )
    right = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, w long")
    plain = {(r["id"], r["w"]) for r in left.join(right, "k").collect()}
    salted = {(r["id"], r["w"]) for r in salted_join(left, right, on="k", salt=8).collect()}
    assert salted == plain and len(plain) == 1000


def test_connected_components_chain_clique_singleton(spark):
    from zync_spark.functions.graph import connected_components

    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # clique 10-11-12, isolated edge 20-21; node 99 has no edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges, "a", "b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert 99 not in got  # singletons are the caller's left-join


def test_nest_flatten_dotted_roundtrip(spark):
    from zync_spark import envelope as E

    df = spark.createDataFrame([(1, "t", 5, "x")], "id long, a string, b long, plain string")
    df = df.select(
        "id",
        F.col("a").alias("kafka.topic"),
        F.col("b").alias("kafka.offset"),
        "plain",
    )
    nested = E.nest_dotted(df)
    assert [f.name for f in nested.schema.fields] == ["id", "kafka", "plain"]
    kafka_t = nested.schema["kafka"].dataType
    assert [f.name for f in kafka_t.fields] == ["topic", "offset"]
    row = nested.collect()[0]
    assert row["kafka"]["topic"] == "t" and row["kafka"]["offset"] == 5

    flat = E.flatten_dotted(nested)
    assert [f.name for f in flat.schema.fields] == [
        "id",
        "kafka.topic",
        "kafka.offset",
        "plain",
    ]
    assert flat.collect() == df.collect()


def test_nest_dotted_deep_and_collision(spark):
    from zync_spark import envelope as E

    df = spark.createDataFrame([(1, 2, 3)], "x long, y long, z long").select(
        F.col("x").alias("a.b.c"),
        F.col("y").alias("a.b.d"),
        F.col("z").alias("a.e"),
    )
    nested = E.nest_dotted(df)
    assert [f.name for f in nested.schema.fields] == ["a"]
    row = nested.collect()[0]
    assert row["a"]["b"]["c"] == 1 and row["a"]["b"]["d"] == 2 and row["a"]["e"] == 3

    bad = spark.createDataFrame([(1, 2)], "x long, y long").select(
        F.col("x").alias("a"),
        F.col("y").alias("a.b"),
    )
    with pytest.raises(ValueError, match="collides"):
        E.nest_dotted(bad)


def test_shape_crop_fill_order(spark):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    from zync_spark import envelope as E

    df = spark.createDataFrame(
        [(1, "x", (5, "deep"))],
        "id long, extra string, rec struct<a:long, junk:string>",
    )
    target = StructType([
        StructField("rec", StructType([
            StructField("a", StringType()),      # cast long -> string
            StructField("b", LongType()),        # missing -> null
        ])),
        StructField("id", StringType()),         # cast + reorder
    ])

    shaped = E.shape(df, target)
    assert shaped.schema.simpleString() == target.simpleString()
    row = shaped.collect()[0]
    assert row["rec"]["a"] == "5" and row["rec"]["b"] is None
    assert row["id"] == "1"

    cropped = E.crop(df, target)
    assert [f.name for f in cropped.schema.fields] == ["rec", "id"]
    assert [f.name for f in cropped.schema["rec"].dataType.fields] == ["a"]
    assert cropped.schema["id"].dataType == LongType()  # no cast

    filled = E.fill(df, target)
    names = [f.name for f in filled.schema.fields]
    assert names == ["rec", "id", "extra"]  # extras appended
    assert [f.name for f in filled.schema["rec"].dataType.fields] == [
        "a", "b", "junk",
    ]
    assert filled.collect()[0]["rec"]["b"] is None

    ordered = E.order_fields(df, target)
    assert [f.name for f in ordered.schema.fields] == ["rec", "id", "extra"]
    assert ordered.schema["id"].dataType == LongType()


def test_semdedup_subset_of_exact_pairs(spark):
    """Cluster blocking can only DROP pairs relative to the exact
    quadratic scan, never invent them; and surviving pairs carry the
    same cosine."""
    import zync_spark.functions.dedup as D

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sem = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in D.semdedup_pairs(emb, k=4, threshold=0.45).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in D.embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.45,
            bucket_bits=0).collect()
    }
    assert set(sem) <= set(exact)
    for k_, v in sem.items():
        assert v == exact[k_]


def test_kmeans_centroids_partition_independent(spark):
    """Fixed-point centroids are bit-identical under any input
    partitioning (the property that makes IVF hash-checkable)."""
    import zync_spark.functions.similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = S.kmeans_centroids(emb, k=4, iterations=2)
    b = S.kmeans_centroids(emb.repartition(13), k=4, iterations=2)
    assert a == b


@pytest.mark.slow
def test_ivf_assign_broadcast_path_matches_literals_and_bounds_plan(spark):
    """Above literal_threshold, centroids ship as a broadcast one-row
    relation instead of plan literals: (a) cell assignment is identical to
    the literal path, (b) serialized-plan size stays O(1) in k — 1024
    centroids must NOT produce a plan ~64x the size of a 16-centroid one
    (the literal path's failure mode)."""
    import zync_spark.functions.similarity as S
    from pyspark.sql import functions as F
    from zync_spark.queries import T

    emb = T(spark, "/root/testdata/sf0.001", "embeddings").limit(40)
    dim = len(emb.select("embedding").first()[0])
    cents = [
        (cid, [((cid * 31 + j * 7) % 97) / 97.0 - 0.5 for j in range(dim)])
        for cid in range(1024)
    ]
    lit = S.ivf_assign(emb, cents, "embedding", nprobe=2,
                       literal_threshold=2048)
    bc = S.ivf_assign(emb, cents, "embedding", nprobe=2,
                      literal_threshold=256)
    got_lit = sorted(tuple(r) for r in lit.select("vec_id", "__cell").collect())
    got_bc = sorted(tuple(r) for r in bc.select("vec_id", "__cell").collect())
    assert got_lit == got_bc and len(got_bc) == 80
    plan_small = S.ivf_assign(emb, cents[:16], "embedding", nprobe=2) \
        ._jdf.queryExecution().optimizedPlan().toString()
    plan_big = bc._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan_big) < 8 * len(plan_small)


def test_decode_media_real_path_with_pillow(spark):
    """Activates only where pillow exists (skipped in this container):
    the real decode path emits true width/height and pixel stats."""
    import pytest as _pytest
    Image = _pytest.importorskip("PIL.Image")
    import io
    from zync_spark.functions.multimodal import MEDIA_SCHEMA, decode_media

    buf = io.BytesIO()
    Image.new("L", (6, 3), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image/png", png, len(png), "x")], MEDIA_SCHEMA)
    row = decode_media(media).collect()[0]
    assert (row["feat0"], row["feat1"]) == (6.0, 3.0)
    assert abs(row["feat2"] - 128 / 255.0) < 1e-9 and row["feat3"] == 0.0


def test_resize_images_real_path_with_pillow(spark):
    import pytest as _pytest
    Image = _pytest.importorskip("PIL.Image")
    import io
    from zync_spark.functions.multimodal import MEDIA_SCHEMA, resize_images

    buf = io.BytesIO()
    Image.new("RGB", (10, 4), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image/png", png, len(png), "x")], MEDIA_SCHEMA)
    row = resize_images(media, width=5, height=2).collect()[0]
    assert (row["width"], row["height"]) == (5, 2)
    # raw RGB bytes: exactly w*h*3, red everywhere
    assert row["n_bytes"] == 5 * 2 * 3
    assert bytes(row["payload"])[:3] == b"\xff\x00\x00"


def test_embedding_neardup_requires_explicit_bucket_bits(vectors):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket_bits"):
        D.embedding_neardup_pairs(vectors, "vec_id", "embedding")


def test_partsupp_synthesis_partition_independent(spark):
    """The synthesized partsupp is a pure function of (part, supplier
    count): identical rows under any input partitioning — the property
    that makes the Q2/Q11/Q16/Q20 oracles hash-stable."""
    from zync_spark.queries import _partsupp

    from zync_spark.queries import T

    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in _partsupp(spark, sf).collect())
    n_parts = T(spark, sf, "part").count()
    assert len(a) == 4 * n_parts
    b = sorted(tuple(r) for r in _partsupp(spark, sf).collect())
    assert a == b
    # (partkey, suppkey) is a key at the gate scale (S=100: the dbgen
    # stride is collision-free mod S there, as in real TPC-H; S=10 at
    # sf0.001 is below the formula's design range and may repeat a
    # supplier — deterministic in both engines either way)
    big = _partsupp(spark, "/root/testdata/sf0.01")
    assert big.count() == big.select("ps_partkey", "ps_suppkey").distinct().count()


def test_pq_ann_recall_beats_random(spark):
    """PQ reconstructions are lossy, but top-5 recall vs the exact scan
    must beat random ranking by a wide margin (8 subspaces x 16 codes
    keeps plenty of signal on this corpus)."""
    from pyspark.sql import functions as F

    import zync_spark.functions.similarity as S
    from zync_spark.queries import T

    emb = T(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(emb, q, k=5).collect()}
    pq = {(r["query_id"], r["neighbor_id"])
          for r in S.pq_ann_topk(emb, q, k=5).collect()}
    n = emb.count()
    assert len(exact) == 50
    # random top-5 would overlap ~5/(n-1) per query
    assert len(pq & exact) / len(exact) >= 3 * 5.0 / (n - 1)


def test_duplicate_spans_merges_overlapping_windows(spark):
    """Two docs sharing a 10-token run: windows at every offset collide,
    and gaps-and-islands must merge them into ONE maximal span per doc
    (not 3 overlapping 8-token spans); a doc with no shared run is absent."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    df = spark.createDataFrame(
        [
            (1, "intro one two " + shared + " outro"),
            (2, shared + " completely different tail here"),
            (3, "nothing in common with the others at all whatsoever today"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in D.duplicate_spans(df, "doc_id", "text", window=8).collect()
    }
    assert set(rows) == {1, 2}
    # doc 1: shared run occupies token positions 3..12
    assert (rows[1].span_start, rows[1].span_end, rows[1].span_tokens) == (3, 12, 10)
    # doc 2: positions 0..9
    assert (rows[2].span_start, rows[2].span_end, rows[2].span_tokens) == (0, 9, 10)


def test_duplicate_spans_distinct_docs_not_self_repeat(spark):
    """A run repeated WITHIN one document only (min_docs=2 default) is not
    a cross-doc duplicate; short docs (< window tokens) never error."""
    rep = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, rep + " filler " + rep), (2, "tiny doc")],
        "doc_id long, text string",
    )
    assert D.duplicate_spans(df, "doc_id", "text", window=8).count() == 0
    # min_docs=1 counts within-doc repeats: two islands in doc 1
    spans = D.duplicate_spans(df, "doc_id", "text", window=8, min_docs=1)
    got = sorted((r.span_start, r.span_end) for r in spans.collect())
    assert got == [(0, 7), (9, 16)]


def test_remove_duplicate_spans_surgery(spark):
    """Removal drops exactly the span tokens, preserves case outside the
    (lowercase-matched) spans, handles overlap from adjacent islands once,
    and returns unaffected docs verbatim (whitespace-normalized)."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    df = spark.createDataFrame(
        [
            (1, "Intro ONE two " + shared + " Outro"),
            (2, shared.upper() + " different tail entirely here now"),
            (3, "solo   document with    odd whitespace only"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in D.remove_duplicate_spans(
        df, "doc_id", "text", window=8).collect()}
    assert rows[1].text == "Intro ONE two Outro"
    assert (rows[1].n_tokens, rows[1].n_removed) == (14, 10)
    # case preserved for the survivors; the UPPER span still matched
    assert rows[2].text == "different tail entirely here now"
    assert rows[3].text == "solo document with odd whitespace only"
    assert rows[3].n_removed == 0


def test_remove_duplicate_spans_total_removal_empty_string(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight"),
         (2, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in D.remove_duplicate_spans(
        df, "doc_id", "text", window=8).collect()}
    assert out == {1: "", 2: ""}


def test_contaminated_spans_and_removal(spark):
    """A verbatim benchmark run inside a training doc is located as a
    span and excised; unrelated docs are untouched; matching is
    case-insensitive; spans never cross the contaminated region."""
    bench = spark.createDataFrame(
        [(100, "What is the CAPITAL of France Paris obviously")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro words here what is the capital of france paris "
                "obviously trailing content stays"),
            (2, "completely unrelated training document with clean text"),
        ],
        "doc_id long, text string",
    )
    spans = D.contaminated_spans(train, bench, "doc_id", "text", window=4)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    # bench is 8 tokens; they sit at positions 3..10 of doc 1
    assert got == {(1, 3, 10)}
    out = {r.doc_id: r for r in
           D.remove_spans(train, spans, "doc_id", "text").collect()}
    assert out[1].text == "intro words here trailing content stays"
    assert (out[1].n_tokens, out[1].n_removed) == (14, 8)
    assert out[2].n_removed == 0


def test_remove_spans_accepts_external_span_sets(spark):
    """remove_spans is span-source-agnostic: a hand-built span frame
    (e.g. from span_index.spans_view) drives the same surgery."""
    df = spark.createDataFrame([(7, "a b c d e f")],
                               "doc_id long, text string")
    spans = spark.createDataFrame([(7, 1, 2, 2), (7, 4, 4, 1)],
                                  "doc_id long, span_start int, "
                                  "span_end int, span_tokens int")
    r = D.remove_spans(df, spans, "doc_id", "text").collect()[0]
    assert (r.text, r.n_removed) == ("a d f", 3)


def test_dot_expr_dim_parity(spark):
    """dot_expr_dim must agree with dot_expr BIT-FOR-BIT on every input
    shape (round 10): equal-length-at-dim rows take the unrolled branch
    (same left-assoc op sequence), every other shape — length mismatch,
    short/long arrays, null elements, null arrays — routes to the
    original fold via the guard. Also pins the fallback: dim=None or
    past the unroll gate returns the plain fold expression."""
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0], [0.5, 0.25, -1.0, 2.0]),   # exact dim
        (2, [1.0, 2.0, 3.0], [0.5, 0.25, -1.0]),             # short==short
        (3, [1.0, 2.0, 3.0, 4.0], [0.5, 0.25, -1.0]),        # mismatch
        (4, [1.0, None, 3.0, 4.0], [0.5, 0.25, -1.0, 2.0]),  # null elem
        (5, None, [0.5, 0.25, -1.0, 2.0]),                   # null array
        (6, [0.1, -0.0, 1e-300, 4.0], [3.0, 7.0, 1e300, 0.125]),
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>")
    got = df.select(
        "id",
        S.dot_expr(F.col("a"), F.col("b")).alias("fold"),
        S.dot_expr_dim(F.col("a"), F.col("b"), 4).alias("unrolled"),
        S.dot_expr_dim(F.col("a"), F.col("b"), None).alias("fallback"),
    ).collect()
    import struct

    def bits(x):
        return None if x is None else struct.pack("<d", x)

    for r in got:
        assert bits(r["fold"]) == bits(r["unrolled"]), r
        assert bits(r["fold"]) == bits(r["fallback"]), r
    # the gate: past _MAX_UNROLL_DIM the expression IS the plain fold —
    # string-identical to dot_expr's, no CASE WHEN guard at all
    # (round-10 ADVICE: the old or-assertion was always satisfiable)
    import re

    def norm(c):  # gensym'd lambda variable counters differ per call
        return re.sub(r"[xy]_\d+", "V", c._jc.toString())

    big = S.dot_expr_dim(F.col("a"), F.col("b"), S._MAX_UNROLL_DIM + 1)
    assert norm(big) == norm(S.dot_expr(F.col("a"), F.col("b")))
    assert "CASE WHEN" not in big._jc.toString().upper()


@pytest.mark.slow
def test_kmeans_arrow_reassign_parity(spark):
    """The Arrow int64 Lloyd kernel (round 10, similarity.
    _kmeans_reassign_arrow) must equal the expression path EXACTLY —
    every (vec_id, cluster, dist) — including argmin TIES (duplicate
    centroids: first-minimum = lowest cluster id) and degenerate rows
    (wrong-length / null vectors → lowest cluster id with null dist,
    the struct-ordering contract). Exactness is by construction
    (integer arithmetic is order-independent), this test pins the
    implementation details: matrix ordering, |x|^2-2xc+|c|^2 identity,
    the fallback branch."""
    import math

    def vec(i):
        return [math.sin(0.31 * (i % 8) + 0.7 * j)
                + 0.01 * ((i * 31 + j * 17) % 19) for j in range(16)]

    # planted exact duplicates → tie-heavy corpus
    rows = [(i, vec(i if i % 7 else 0)) for i in range(3000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    scaled = S._kmeans_scaled(df, "vec_id", "embedding", 1 << 20)
    cents = S._kmeans_seed_rows(scaled, 90)
    # force an exact inter-cluster tie
    cents[5] = {"cluster": cents[5]["cluster"], "c": list(cents[4]["c"])}
    bad = spark.createDataFrame(
        [(900001, [1, 2, 3]), (900002, None),
         # right LENGTH but a null element: Arrow→pandas renders this
         # as a float64 ndarray holding NaN, not None — must still
         # route to the fallback branch (round-10 ADVICE)
         (900003, [None] + [1] * 15)],
        "vec_id long, xs array<bigint>")
    inp = scaled.unionByName(bad)
    expr = sorted(map(tuple, S._kmeans_reassign(
        inp, cents, literal_threshold=10**9)
        .select("vec_id", "cluster", "dist").collect()))
    arrow = sorted(map(tuple, S._kmeans_reassign_arrow(inp, cents)
                       .select("vec_id", "cluster", "dist").collect()))
    assert expr == arrow
    # the gate: > _KMEANS_ARROW_K centroids routes to the kernel
    assert len(cents) > S._KMEANS_ARROW_K
    auto = sorted(map(tuple, S._kmeans_reassign(inp, cents)
                      .select("vec_id", "cluster", "dist").collect()))
    assert auto == expr
    # non-long id columns ride the kernel unchanged — out_schema
    # derives vec_id's type from the input plan (round-10 ADVICE)
    sid = scaled.limit(50).select(
        F.concat(F.lit("d-"), F.col("vec_id")).alias("vec_id"), "xs")
    sa = S._kmeans_reassign_arrow(sid, cents).select(
        "vec_id", "cluster", "dist")
    assert dict(sa.dtypes)["vec_id"] == "string"
    s_expr = sorted(map(tuple, S._kmeans_reassign(
        sid, cents, literal_threshold=10**9)
        .select("vec_id", "cluster", "dist").collect()))
    assert sorted(map(tuple, sa.collect())) == s_expr


@pytest.mark.slow
def test_ivf_assign_arrow_parity(spark):
    """The Arrow FLOAT assignment kernel (round 11, similarity.
    _ivf_assign_arrow) must equal ivf_assign(nprobe=1) EXACTLY — cell
    for cell — including duplicate-centroid TIES (struct order: equal
    negcos -> lowest cid) and degenerate rows (wrong length / null
    array / null element / NaN element -> null-or-NaN score on every
    cell -> lowest cid). Exactness is by the left-assoc fold replay
    (see the kernel docstring); this test pins it with data."""
    import math

    def vec(i):
        return [math.sin(0.29 * (i % 9) + 0.61 * j)
                + 0.01 * ((i * 37 + j * 13) % 23) for j in range(16)]

    rows = [(i, vec(i if i % 5 else 0)) for i in range(2500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = S.kmeans_centroids(df, k=90, iterations=2,
                               id_col="vec_id", vec_col="embedding")
    assert len(cents) > S._KMEANS_ARROW_K
    # force an exact inter-centroid tie: two cids, same vector
    cents[7] = (cents[7][0], list(cents[6][1]))
    bad = spark.createDataFrame(
        [(900001, [1.0, 2.0]),                    # wrong length
         (900002, None),                          # null array
         (900003, [None] + [1.0] * 15),           # null element
         (900004, [float("nan")] + [1.0] * 15)],  # NaN element
        "vec_id long, embedding array<double>")
    inp = df.unionByName(bad)
    expr = sorted(map(tuple, S.ivf_assign(
        inp, cents, "embedding", nprobe=1, literal_threshold=10**9)
        .select("vec_id", "__cell").collect()))
    arrow = sorted(map(tuple, S._ivf_assign_arrow(inp, cents, "embedding")
                       .select("vec_id", "__cell").collect()))
    assert expr == arrow
    # the gate: ivf_assign_fast routes > _KMEANS_ARROW_K to the kernel
    # and carries every input column through untouched
    fast = S.ivf_assign_fast(inp, cents, "embedding")
    assert set(fast.columns) == {"vec_id", "embedding", "__cell"}
    assert sorted(map(tuple,
                      fast.select("vec_id", "__cell").collect())) == expr
    small = S.ivf_assign_fast(inp, cents[:8], "embedding")
    assert "MapInPandas" not in small._jdf.queryExecution().toString()
