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
