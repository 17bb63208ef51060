"""Rank fusion for hybrid retrieval: combine lexical (BM25) and
semantic (embedding-cosine) rankings into one result list.

Reciprocal-rank fusion (RRF, Cormack/Clarke/Buettcher SIGIR'09) is the
standard score-free fusion: each list contributes 1/(c + rank) for the
items it ranked, absent items contribute 0, and the fused order is the
sum. Score-free matters here because the two rankers' scores live on
incomparable scales (integer micro-nat BM25 vs cosine in [-1, 1]).

Scale posture: fusion consumes the rankers' TOP-K LISTS, not their
corpora — every input is k-sized by construction (the expensive part,
producing the rankings, is the bounded-probe index queries:
streaming/text_index.search_text reads only the query terms' posting
buckets, streaming/ann_index.ann_query only the probed cells' files).
The fusion itself is metadata-sized: a full-outer join chain and one
global window over at most len(rankings)*k rows.

Determinism (the oracle hash-compare contract): 1/(c + rank) is a
single IEEE division of exact integers and the fused score is a fixed
left-to-right sum of those terms, so the doubles are bit-identical
across engines; ties break by id.

Reference parity: the reference has no retrieval surface (beyond-
reference, like the three index families this composes — SURVEY §2
LLM-pipeline block).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    names: Sequence[str] | None = None,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """Fuse N ranked lists by (optionally weighted) reciprocal-rank
    fusion.

    Each input must carry (id_col, rank_col) with rank 1-based and
    unique per list; inputs are expected to be top-k lists (this runs a
    single global window — correct at any size, but sized for k-lists).

    Output: id_col, one nullable-long rank column per input (named by
    `names`, default rank_1..rank_N; null = the item was absent from
    that list), `rrf` (double, sum over lists of w/(c + rank); weights
    default to the classic unweighted 1.0 — `1.0*x == x` exactly, so
    the default is bit-identical to unweighted), and `rank` (long,
    1-based by rrf desc, ties by id) filtered to <= k.
    """
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    if names is None:
        names = [f"rank_{i + 1}" for i in range(len(rankings))]
    if len(names) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(rankings)} rankings but {len(names)} names")
    reserved = {id_col, "rrf", "rank"}
    if len(set(names)) != len(names) or reserved & set(names):
        raise ValueError(
            f"rrf_fuse: names must be unique and disjoint from {reserved}")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(rankings)} rankings but {len(weights)} weights")
    sides = [
        r.select(F.col(id_col), F.col(rank_col).cast("long").alias(nm))
        for r, nm in zip(rankings, names)
    ]
    # USING-style join coalesces id_col across the full outer by itself
    fused = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)

    # fixed left-to-right sum in `names` order — mirrored in oracle SQL
    def term(nm, w):
        return F.coalesce(
            F.lit(float(w)) / (F.lit(c) + F.col(nm)), F.lit(0.0))

    score = reduce(
        lambda acc, nw: acc + term(*nw),
        list(zip(names, weights))[1:],
        term(names[0], weights[0]),
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col))
    return (
        fused.withColumn("rrf", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, *names, "rrf", "rank")
    )
