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


def test_embedding_neardup(vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(vectors, "vec_id", "embedding", threshold=0.95).collect()}
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
