"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline. The
  query set is broadcast (it is small by construction), so the big side
  never shuffles: scan → broadcast-nested-loop join → window per query.
- `lsh_ann_topk`: random-hyperplane LSH approximate top-k — the scale path.
  Bucketing is a pure Column expression; candidate generation is an
  equi-join on bucket id, which Catalyst shuffles on a narrow int key
  (or broadcasts the query side).

Dot products use `zip_with` + `aggregate` fold over doubles: sequential
per-row JVM arithmetic, reproducible bit-for-bit by the SQL oracle
(list_dot_product over DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Output: (query_id, neighbor_id, rank, cos). Self-matches excluded.
    Rank is deterministic: ties on rounded cosine break by neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qn"),
    )
    # Dim-sized corpora take the one-window degenerate path (round 8):
    # below _SMALL_CORPUS_BYTES the scored side is provably too small to
    # recreate the gsf100 per-query funnel (SCALING §14), so the
    # two-stage partial rank's extra local-sort stage and the _spread
    # repartition are pure stage-wall overhead — measured 0.21 s -> 0.15 s
    # on the pooled sf0.1 layout. Past the gate (or when the frame is
    # not file-backed and the size is unknowable) the scale shape stands.
    small = _corpus_bytes(corpus) < _SMALL_CORPUS_BYTES
    if not small:
        # Spread only when the scan under-splits (small corpora = one
        # parquet split); an already-parallel corpus must NOT be
        # round-robin-reshuffled just to score it. Shares dedup._spread,
        # whose file-size split estimate avoids a ~0.3s df.rdd
        # conversion probe per query build.
        from zync_spark.functions.dedup import _spread

        corpus = _spread(corpus)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
    )
    # Norms are computed once per side; the per-pair work is a single fold.
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    if small:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id"))
        return (scored.withColumn("rank",
                                  F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= k)
                # same ORDERED schema as topk_per_query: the output
                # shape must not vary with corpus size (round-8 ADVICE)
                .select("query_id", "neighbor_id", "rank", "cos"))
    return topk_per_query(scored, k)


# One-window gate for cosine_topk: 4 MB of compressed vectors ≈ ~15k
# 64-dim floats — even a few hundred query vectors against that is a
# sub-million-row window, orders below the funnel the two-stage shape
# exists for. Unknown size (non-file frame) → treat as big (scale shape).
_SMALL_CORPUS_BYTES = 4 << 20


def _corpus_bytes(df: DataFrame) -> int:
    """Compressed bytes behind a file-backed frame; 'huge' when unknowable
    — plan-time metadata only (the same inputFiles stat _spread uses).
    Packed reads (pool.read_packed) coalesce, which empties inputFiles();
    they carry their stat as the _zs_bytes attribute instead."""
    import os as _os

    carried = getattr(df, "_zs_bytes", None)
    if carried is not None:
        return int(carried)
    try:
        files = df.inputFiles()
        if not files:
            return 1 << 62
        from zync_spark.pool import local_paths

        return sum(_os.path.getsize(f) for f in local_paths(files))
    except Exception:
        return 1 << 62


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-stage exact per-query top-k (the TakeOrdered pattern, shared
    by every ANN scorer): a single window over query_id funnels EVERY
    scored row into #queries groups — a parallelism ceiling of #queries
    tasks, each fully sorting candidate-set-sized input. Measured
    super-linear at the gsf100 decade (800k vectors, 10 queries:
    brute-force cosine 53 s, PQ 283 s — SCALING §14). Stage 1 ranks
    within (query, input partition): the shuffle spreads over
    #queries x #partitions keys and each task sorts candidates/
    partitions rows; only the per-partition top-k survivors
    (k x partitions rows per query) reach the final, now-tiny,
    per-query window. EXACT under the strict total order
    (cos desc, neighbor_id): a row outside its partition's top-k
    cannot be in the global top-k."""
    w1 = Window.partitionBy("query_id", "_pid").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    part = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        part.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplane(dim_idx: int, bit: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1) derived
    from a hash of (bit, dim) — stable across runs/engines, no RNG state."""
    import hashlib

    h = int(hashlib.md5(f"plane-{bit}-{dim_idx}".encode()).hexdigest()[:8], 16)
    return (h / float(1 << 31)) - 1.0


def hyperplane_bucket(vec: Column, nbits: int, dim: int = 64) -> Column:
    """Sign-bit LSH bucket id (int) from `nbits` fixed hyperplanes.

    `dim` must cover the embedding length; a shorter/longer vector uses
    its first min(dim, len) components (null-padded products coalesce to
    0 rather than poisoning the whole projection into bucket 0 — which
    would silently degenerate the bucket join to a cross join)."""
    bucket = F.lit(0)
    for bit in range(nbits):
        # one py4j call per plane (F.lit on a list), not one per component:
        # nbits*dim individual F.lit round-trips cost ~1.5ms each and
        # dominated query-build time (round-3 profiling)
        plane = F.lit([_hyperplane(d, bit) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, p: F.coalesce(x.cast("double") * p, F.lit(0.0))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's hyperplane bucket
    are scored. Recall < 1 by design; bucket count 2^nbits trades recall
    for candidate-set size. `dim` = embedding dimensionality (the
    hyperplanes are dim-long). Same output shape as cosine_topk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qn"),
        hyperplane_bucket(F.col(vec_col), nbits, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
        hyperplane_bucket(F.col(vec_col), nbits, dim).alias("bucket"),
    )
    # norms once per SIDE (rows), not per candidate pair — the per-pair
    # work is the single dot fold (same pattern as cosine_topk)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    return topk_per_query(scored, k)


def _kmeans_scaled(df: DataFrame, id_col: str, vec_col: str,
                   scale: int) -> DataFrame:
    """(vec_id, xs: array<long>) — the fixed-point view of the corpus."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("xs"),
    )


def _kmeans_cents_rows(cur: DataFrame) -> list:
    """Centroids of the CURRENT assignment in the fixed-point recipe
    (scaled-long sums, truncating integer division), COLLECTED and
    sorted by cluster: k x dim longs — metadata-sized driver state, the
    same class as ann_index.stored_centroids. Empty clusters produce no
    row (cell ids need not be dense)."""
    rows = (
        cur.select("cluster", F.posexplode("xs").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .select("cluster", "pos", F.expr("s div n").alias("ci"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ci"))),
                lambda st: st["ci"],
            ).alias("c")
        )
        .collect()
    )
    return sorted(rows, key=lambda r: r["cluster"])


def _kmeans_reassign(scaled: DataFrame, cents_rows: list,
                     literal_threshold: int = 256) -> DataFrame:
    """Map-side argmin reassignment of the corpus against COLLECTED
    centroids — two shipping strategies, same semantics as ivf_assign:
    literal arrays below the threshold (plan-embedded, no exchange at
    all), a one-row local relation broadcast above it (its broadcast
    child is already-computed DATA, so there is nothing for the
    broadcast thread to run — see kmeans_assignments' round-9 note).
    Ties break by (dist, cluster) — identical to the pre-round-9 order,
    and independent of the centroid array's element order."""
    if not cents_rows:  # empty corpus: nothing to assign
        return scaled.select(
            "vec_id", "xs",
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("long").alias("dist"))
    if len(cents_rows) <= literal_threshold:
        cents = F.array(*[
            F.struct(
                F.lit(int(r["cluster"])).cast("long").alias("cluster"),
                # one py4j call per centroid, not one per component
                F.lit([int(x) for x in r["c"]]).alias("c"),
            )
            for r in cents_rows
        ])
        base = scaled
    else:
        cdf = scaled.sparkSession.createDataFrame(
            [([(int(r["cluster"]), [int(x) for x in r["c"]])
               for r in cents_rows],)],
            "__kcents array<struct<cluster:bigint,c:array<bigint>>>",
        )
        base = scaled.crossJoin(F.broadcast(cdf))
        cents = F.col("__kcents")
    best = F.array_sort(
        F.transform(
            cents,
            lambda cc: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("xs"), cc["c"], lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                cc["cluster"].alias("cluster"),
            ),
        )
    )[0]
    return (
        base.withColumn("__best", best)
        .select(
            "vec_id",
            "xs",
            F.col("__best.cluster").alias("cluster"),
            F.col("__best.dist").alias("dist"),
        )
        .drop("__kcents")
    )


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 20,
) -> DataFrame:
    """Lloyd's k-means over embedding vectors, in exact fixed-point integer
    arithmetic so every engine computes identical assignments (floats are
    scaled by 2^20 and floored; centroids use truncating integer division —
    the same rounding in Spark `div` and DuckDB `//`).

    Iterative algorithm on Spark: the CORPUS NEVER SHUFFLES. Each round:
    (a) centroid recompute = posexplode off the current assignment +
    groupBy(cluster, dim) — partial sums combine map-side, only k*dim
    longs cross the wire, and the k centroids are COLLECTED to the
    driver (k x dim longs — metadata-sized, the same class as a stored
    quantizer); (b) reassignment is a pure map against the collected
    centroids (array_sort-argmin fold in whole-stage codegen — no
    per-candidate row fanout, no groupBy, no window).

    Round-9 revision (measured at the 200k-vector rebuild): the previous
    formulation unrolled all rounds into ONE lazy plan, crossJoin-
    broadcasting each round's centroid row. That put the ENTIRE previous
    round's computation inside a BroadcastExchange CHILD, which Spark
    runs in a side thread under the hard `spark.sql.broadcastTimeout`
    wall (300 s default) — a corpus whose per-round scan exceeds it
    (fold_tombstones lineage at 200k vectors already did) fails
    structurally, and lineage depth grew with every round. Collecting
    the k x dim centroids between rounds keeps lineage depth CONSTANT,
    puts zero computation inside broadcast threads, and is bit-identical
    (the collected longs are re-embedded exactly). Cost: one corpus
    aggregation JOB per round instead of one fused plan — the same scans
    the fused plan ran anyway, now individually schedulable. Callers
    with expensive input lineage should persist their frame.

    Init is deterministic (cluster = vec_id % k). Returns
    (vec_id, cluster, dist) after `iterations` reassignment rounds.
    """
    scaled = _kmeans_scaled(df, id_col, vec_col, scale)
    cur = scaled.select(
        "vec_id", "xs", (F.col("vec_id") % k).cast("long").alias("cluster")
    )
    for _ in range(iterations):
        cur = _kmeans_reassign(scaled, _kmeans_cents_rows(cur))
    return cur.select("vec_id", "cluster", "dist")


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 20,
) -> list[tuple[int, list[float]]]:
    """Final k-means centroid vectors as driver-side literals, for coarse
    quantizers (IVF). Runs the same unrolled Lloyd plan as
    kmeans_assignments, then recomputes each cluster's centroid with the
    SAME fixed-point recipe the rounds use (scaled-long sums, truncating
    integer division) and converts back exactly (ci / 2^20 is exact in
    double). That makes the centroids — and therefore every IVF cell
    boundary — bit-identical on every engine and under every partitioning:
    no last-ulp drift from a distributed float mean. The collect is k rows
    of dim values (KBs); the corpus never moves. Empty clusters simply
    produce no centroid (cell ids need not be dense).

    Round 9: runs the collected-centroid rounds directly (see
    kmeans_assignments) — the final centroid recompute IS one more
    _kmeans_cents_rows over the last assignment, which also deletes the
    old formulation's corpus self-join (scaled x assignments)."""
    scaled = _kmeans_scaled(df, id_col, vec_col, scale)
    cur = scaled.select(
        "vec_id", "xs", (F.col("vec_id") % k).cast("long").alias("cluster")
    )
    for _ in range(iterations):
        cur = _kmeans_reassign(scaled, _kmeans_cents_rows(cur))
    return [
        (int(r["cluster"]), [int(x) / scale for x in r["c"]])
        for r in _kmeans_cents_rows(cur)
    ]


def ivf_assign(df: DataFrame, centroids: list[tuple[int, list[float]]],
               vec_col: str, nprobe: int = 1,
               literal_threshold: int = 256) -> DataFrame:
    """Attach the `nprobe` nearest coarse-centroid cell ids to each row
    (exploded, one row per probed cell).

    Two centroid-shipping strategies, same semantics:
    - k <= literal_threshold: centroids ship as literal arrays inside the
      plan — broadcast with the closure, no join. Cheapest at small k, but
      each centroid value is a Catalyst Literal NODE, so analysis/codegen
      cost and serialized-plan size grow with k*dim.
    - k > literal_threshold: centroids become a ONE-ROW local relation
      (the whole table as one array<struct> value) broadcast-cross-joined
      onto the frame. The values travel as DATA through one
      BroadcastExchange — plan size and codegen stay O(1) in k, and the
      per-row scoring expression is identical. No extra shuffle either
      way."""
    if len(centroids) <= literal_threshold:
        cents = F.array(
            *[
                F.struct(
                    F.lit(cid).alias("cid"),
                    # one py4j call per centroid, not one per component
                    F.lit([float(x) for x in vec]).alias("cv"),
                )
                for cid, vec in centroids
            ]
        )
        base = df
    else:
        cents_df = df.sparkSession.createDataFrame(
            [([(int(cid), [float(x) for x in vec])
               for cid, vec in centroids],)],
            "__cents array<struct<cid:bigint,cv:array<double>>>",
        )
        base = df.crossJoin(F.broadcast(cents_df))
        cents = F.col("__cents")
    scored = F.transform(
        cents,
        lambda c: F.struct(
            (-cosine_expr(F.col(vec_col), c["cv"])).alias("negcos"),
            c["cid"].alias("cid"),
        ),
    )
    probed = F.slice(F.array_sort(scored), 1, nprobe)
    out = base.withColumn(
        "__cell", F.explode(F.transform(probed, lambda s: s["cid"])))
    return out.drop("__cents")


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer of
    `n_cells` k-means centroids partitions the corpus; each query probes
    its `nprobe` nearest cells and scores only those candidates.

    The coarse centroids are trained with the in-engine Lloyd k-means
    (kmeans_centroids: corpus never shuffles, only k*dim partial sums do) —
    real cluster centers, not a hash sample, so cells are balanced and
    recall doesn't hinge on sampling luck. Corpus rows assign to 1 cell;
    queries probe `nprobe` cells (recall/cost knob). Same output shape as
    cosine_topk. `centroids` supplies a pre-trained quantizer instead
    (the frozen-centroid contract of streaming.ann_index; n_cells is
    then ignored).
    """
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, k=n_cells, iterations=2, id_col=id_col, vec_col=vec_col
        )
    if not centroids:
        raise ValueError("ivf_ann_topk: empty corpus")

    c = ivf_assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm_expr(F.col(vec_col)).alias("cn"),
        ),
        centroids, "cv", nprobe=1,
    )
    q = ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm_expr(F.col(vec_col)).alias("qn"),
        ),
        centroids, "qv", nprobe=nprobe,
    )
    scored = (
        c.join(F.broadcast(q), "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
        # a neighbor can appear via more than one probed cell
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return topk_per_query(scored, k)


# -- Product quantization (PQ) ANN ------------------------------------------


def pq_codebook(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", ks: int = 16,
                scale: int = 1 << 20) -> dict[int, list[float]]:
    """One-step PQ codebook: full-dimension fixed-point centroids of the
    deterministic init partition (vec_id % ks); subspace codewords are
    SLICES of these. One averaging step (not iterated Lloyd) keeps the
    codebook a closed-form GROUP BY — reproducible verbatim in the SQL
    oracle with no recursion — while still being data-driven. The same
    fixed-point recipe as kmeans_centroids (floor-scaled longs,
    truncating div, /2^20 exact in double) makes every codeword
    bit-identical across engines and partitionings. Collect is ks rows
    of dim doubles (KBs); the corpus never shuffles — only ks*dim
    partial sums do."""
    scaled = df.select(
        (F.col(id_col) % ks).cast("long").alias("c"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * scale).cast("long"))
        ).alias("pos", "x"),
    )
    rows = (
        scaled.groupBy("c", "pos")
        .agg(F.expr("sum(x) div count(1)").alias("ci"))
        .groupBy("c")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ci"))),
            lambda s: s["ci"]).alias("cv"))
        .collect()
    )
    return {int(r["c"]): [int(v) / scale for v in r["cv"]] for r in rows}


def _dlit(x: float) -> str:
    """Round-trip double literal for Spark SQL (D suffix forces DOUBLE —
    a bare decimal literal would parse as DECIMAL)."""
    return f"{x!r}D"


def _pq_reconstruct_expr(codebook: dict[int, list[float]], m: int) -> str:
    """SQL expression (over a bound array<double> column `__v`)
    reconstructing the PQ quantization of __v: per subspace, the L2
    argmin codeword (ties break on the smaller code, matching the
    oracle's ORDER BY dist, c), concatenated back to full dimension.
    Built as ONE expr string — the codebook is m*ks*subdim literals, and
    per-literal Column construction would pay thousands of py4j
    round-trips (round-3 lesson)."""
    dim = len(next(iter(codebook.values())))
    subdim = dim // m
    segs = []
    for s in range(m):
        cands = []
        for c in sorted(codebook):
            cv = codebook[c][s * subdim:(s + 1) * subdim]
            arr = "array(" + ",".join(_dlit(x) for x in cv) + ")"
            dist = (
                f"aggregate(zip_with(slice(__v, {s * subdim + 1}, {subdim}),"
                f" {arr}, (a, b) -> (a - b) * (a - b)),"
                f" cast(0.0 as double), (acc, x) -> acc + x)")
            cands.append(f"struct({dist} as d, {c} as c, {arr} as cv)")
        segs.append(
            f"element_at(array_sort(array({','.join(cands)})), 1).cv")
    return f"flatten(array({','.join(segs)}))"


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    scale: int = 1 << 20,
) -> DataFrame:
    """PQ approximate top-k (asymmetric distance): the corpus is encoded
    to m subspace codewords from a ks-entry-per-subspace codebook; each
    query scores the RECONSTRUCTED corpus vectors exactly — ADC, where
    the quantization error is on the corpus side only. Same output shape
    as cosine_topk.

    Scale posture: the codebook is KBs (broadcast with the plan); encode
    + reconstruction is a pure map over the corpus scan (the stored form
    of an encoded corpus is m SMALL codes per vector — 8 bytes here vs
    512 for the raw vector, the whole point of PQ); scoring is the
    broadcast-queries pattern of cosine_topk. Fully deterministic
    (fixed-point codebook, left-fold float arithmetic, code tie-breaks)
    — hash-checked against a self-contained SQL oracle."""
    from zync_spark.functions.dedup import _spread

    codebook = pq_codebook(corpus, id_col, vec_col, ks, scale)
    if not codebook:
        raise ValueError("pq_ann_topk: empty corpus")
    xq = _pq_reconstruct_expr(codebook, m)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qv"),
    ).select("query_id", "qv", norm_expr(F.col("qv")).alias("qn"))
    c = (
        _spread(corpus)
        .select(F.col(id_col).alias("neighbor_id"),
                F.expr(f"transform({vec_col}, x -> cast(x as double))")
                .alias("__v"))
        .select("neighbor_id", F.expr(xq).alias("cv"))
        .select("neighbor_id", "cv", norm_expr(F.col("cv")).alias("cn"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot_expr(F.col("qv"), F.col("cv"))
             / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    return topk_per_query(scored, k)
