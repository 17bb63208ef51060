"""Distributed graph primitives for dedup-cluster resolution.

After pair generation (MinHash/LSH, Jaccard, embedding near-dup), turning
"A dups B" pairs into canonical clusters is a connected-components
problem. The reference has no graph surface (its ETL joins are two-table,
etl/build.go:120-216); this is part of the beyond-reference LLM-pipeline
layer, where picking one canonical document per near-dup cluster is a
core training-data operation.

Scale posture: min-label propagation, one shuffle per round, converging
in O(cluster diameter) rounds — near-dup clusters are shallow (dups of a
common source: diameter ≲ 3), so 3-5 rounds at any corpus size; the
per-round shuffle is edges+labels, never documents. Lineage is cut with
localCheckpoint each round so plans stay bounded. For adversarial
long-chain graphs, swap in alternating large-star/small-star (O(log n)
rounds, same join-groupBy skeleton) — the CC-MR construction of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Resolve undirected `edges` into components.

    Returns (node, label): label is the minimum node id reachable from
    `node` — a deterministic canonical id, independent of partitioning
    and join order (min is commutative), so results are reproducible
    across cluster sizes. Only nodes incident to an edge appear;
    callers layer singletons back with a left join + coalesce.
    """
    sym = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
    sym = sym.localCheckpoint(eager=False)
    labels = sym.select("node").distinct().withColumn("label", F.col("node"))
    for _ in range(max_iter):
        # each node proposes its label to every neighbor; keep the min of
        # (own label, proposals). groupBy does map-side partial min, so
        # the shuffle carries one candidate per (node, partition).
        proposals = sym.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        new_labels = (
            labels.unionByName(proposals)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)  # bound lineage across rounds
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "prev"), "node")
            .filter(F.col("label") != F.col("prev"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # a silent non-converged return would split one component into
        # several "canonical" ids — for dedup callers that means keeping
        # duplicates and calling it clean. Fail loudly; diameter > 25 is
        # pathological for near-dup graphs, and the caller can raise
        # max_iter deliberately.
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels
