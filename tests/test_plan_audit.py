"""Catalog-wide physical-plan audit: builds the logical plan of EVERY
catalog query (no execution) and asserts the fleet-level invariants that
individual plan-shape tests spot-check:

  1. No Python evaluation nodes anywhere except the explicitly-Python
     operators (multimodal decode is Arrow-batched mapInPandas by design).
  2. No query shuffles absurdly (exchange count bounded — a silent
     de-optimization that doubles a query's shuffles fails here even if
     nobody wrote a dedicated plan test for it).

Procedural entries that materialize state when CALLED (pool builders,
streaming runs) are excluded — their cost/shape is covered by their own
lifecycle tests."""

from __future__ import annotations

import re

import pytest

from zync_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

PY_NODES = r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"

# entries that RUN work (pools, streams) at call time — not plan-only
PROCEDURAL = {
    "etl_invoices",
    "rollup_incremental",
    "stream_window_counts",
    "stream_dedup",
    "stream_dedup_watermarked",
    "stream_stream_join",
    "stream_stateful_sessions",
}
# Python-by-design: binary decode must leave the JVM (Arrow-batched)
PYTHON_OK = {
    "multimodal_features", "multimodal_resize", "multimodal_frames",
    # the Misra-Gries sketch holds <= capacity live counters in Python
    # (imperative decrement state no JVM expression expresses); Arrow-
    # batched mapInPandas, enforced by test_python_operators_are_arrow_batched
    "q_approx_topk",
    "q_grouped_approx_topk",
}

# loose fleet-wide ceiling; queries with legitimately many stages
# (iterative k-means, multi-stage tf-idf / LM / curation composites)
# declare their own budget here instead of weakening the global one
SHUFFLE_BUDGET = 6
CUSTOM_BUDGET = {
    "kmeans_clusters": 40,      # unrolled Lloyd rounds, tiny exchanges
    "dedup_semantic": 16,       # k-means rounds (k×dim-row exchanges) +
                                # ONE corpus-by-cluster shuffle for pairs
    "dedup_curate": 20,         # pairs + components rounds + ranking
    "dedup_components": 16,     # one exchange per propagation round
    "text_tfidf_topk": 8,
    # round-12 shape: per-(doc,tok) counts once + window df + 1-row
    # total re-agg — 7 exchanges, all counts-table-sized or smaller
    # (the corpus tokenizes twice instead of three times)
    "text_ppl_unigram": 7,
    "q_corr_subquery": 8,
    "emb_neardup": 8,
    # a MEASUREMENT entry: three full recall evaluations (exact top-k
    # window + hit-join + per-query agg, at nprobe=2/8/16) composed into
    # one row — every exchange moves <=25-row query frames or k-cell
    # aggregates, never the corpus. Round 7: +7 — every ANN top-k gained
    # one partial-rank exchange (_topk_per_query; the gsf100 fix for the
    # per-query sort funnel), and this entry composes seven of them
    "ann_recall_at10": 39,
    # two bounded index-probe legs + RRF full-join + the attr-filter
    # read; all exchanges move candidate/rank frames, never the corpus
    "hybrid_retrieval_attr_filtered": 8,
}


def _audit_targets():
    return sorted(set(QUERIES) - PROCEDURAL)


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name in _audit_targets():
        df = QUERIES[name](spark, SF)
        out[name] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    return out


def test_no_python_in_hot_paths(plans):
    offenders = {
        name
        for name, p in plans.items()
        if name not in PYTHON_OK and re.search(PY_NODES, p)
    }
    assert not offenders, f"Python eval nodes crept into: {sorted(offenders)}"


def test_python_operators_are_arrow_batched(plans):
    # the sanctioned Python operators must use Arrow batches (mapInPandas),
    # never row-at-a-time BatchEvalPython
    for name in sorted(PYTHON_OK & set(plans)):
        assert re.search(r"MapInPandas|ArrowEvalPython", plans[name]), name
        assert "BatchEvalPython" not in plans[name], name


def test_spread_is_conditional(spark):
    """_spread must NOT round-robin-shuffle (id, full text) when the input
    is already parallel enough — at 100 TB that reshuffle would be the
    single most expensive byte movement in the dedup family. It must still
    kick in when the scan under-splits (one-split small corpora)."""
    from pyspark.sql import functions as F

    from zync_spark.functions import dedup as D

    target = spark.sparkContext.defaultParallelism

    def docs(n_parts):
        # spark.range with an explicit partition count: parallel WITHOUT
        # introducing its own round-robin exchange into the plan
        return spark.range(0, 256, 1, n_parts).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", F.lit("alpha beta gamma delta epsilon"),
                F.col("id").cast("string"),
            ).alias("text"),
        )

    def plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    for build in (
        lambda d: D.doc_shingles(d, "doc_id", "text"),
        lambda d: D.simhash(d, "doc_id", "text"),
        lambda d: D.minhash_signatures(d, "doc_id", "text"),
    ):
        assert "RoundRobinPartitioning" not in plan(build(docs(target))), (
            "dedup plan reshuffles an already-parallel corpus"
        )
        assert "RoundRobinPartitioning" in plan(build(docs(1))), (
            "under-split corpus no longer spreads to full parallelism"
        )


def test_ensure_compute_splits_shared_guard(spark, tmp_path):
    """The factored helper (round-11 ask #3 — ONE implementation for
    dedup, the vector-family sync/rebuild paths, and the ANN query
    sides): an under-split input spreads to full parallelism; an
    already-parallel one is returned UNTOUCHED (same object — no
    redundant exchange), on both the file-metadata estimate and the
    rdd-probe fallback."""
    from zync_spark.functions.compute import ensure_compute_splits

    target = spark.sparkContext.defaultParallelism
    # non-file frames take the rdd probe
    one = spark.range(0, 512, 1, 1).select("id")
    assert ensure_compute_splits(one).rdd.getNumPartitions() >= target
    par = spark.range(0, 512, 1, target).select("id")
    assert ensure_compute_splits(par) is par
    # file-backed frames take the driver-side split estimate: a
    # one-split parquet spreads ...
    p1 = str(tmp_path / "small")
    spark.range(0, 512, 1, 1).write.parquet(p1)
    small = spark.read.parquet(p1)
    assert ensure_compute_splits(small).rdd.getNumPartitions() >= target
    # ... a many-file (>= parallelism row groups) layout does not
    p2 = str(tmp_path / "wide")
    spark.range(0, 4096).repartition(target * 2).write.parquet(p2)
    wide = spark.read.parquet(p2)
    assert ensure_compute_splits(wide) is wide


def test_shuffle_budgets(plans):
    over = {}
    for name, p in plans.items():
        n = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
        if n > CUSTOM_BUDGET.get(name, SHUFFLE_BUDGET):
            over[name] = n
    assert not over, f"shuffle budget exceeded: {over}"
