"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the point of this module is 100 TB corpora):

- Exact dedup is a hash-groupBy: one shuffle on a 16-byte digest, map-side
  partial aggregation, no row text ever shuffles (we group on md5).
- Jaccard pair generation uses an inverted index (explode shingles → self
  equi-join on shingle) instead of a cross join: cost is sum over shingles of
  df(s)^2, not n^2. `max_shingle_freq` drops degenerate ultra-frequent
  shingles (a stopword shingle shared by millions of docs would otherwise
  create a quadratic hot partition — classic skew). AQE skew-join splitting
  handles the residual tail.
- MinHash compresses each doc's shingle set to `num_hashes` longs, so the
  candidate-generation join shuffles signatures (KBs) instead of shingle
  sets (MBs); LSH banding makes candidate generation linear in the number
  of colliding pairs. Verification re-checks exact Jaccard on candidates
  only.
- SimHash is a single groupBy over (doc, bit) partial sums — fully
  map-reducible, no joins.

All hashes derive from md5 so an external SQL oracle reproduces them bit-for-bit
(see queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zync_spark.functions.text import (
    HASH_PRIME,
    md5_long,
    tokens,
    word_shingles,
)

# MinHash permutation parameters h_i(x) = (a_i * x + b_i) mod P, generated
# deterministically (no RNG at plan-build time; resume-safe).
MINHASH_PRIME = HASH_PRIME


def _perm_params(num_hashes: int) -> list[tuple[int, int]]:
    # Deterministic LCG-derived odd multipliers/offsets; any fixed full-rank
    # family works, cross-run stability is what matters.
    params = []
    a, b = 1103515245, 12345
    x = 42
    for _ in range(num_hashes):
        x = (a * x + b) % MINHASH_PRIME
        mult = (2 * x + 1) % MINHASH_PRIME
        x = (a * x + b) % MINHASH_PRIME
        off = x % MINHASH_PRIME
        params.append((mult, off))
    return params


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5 digest; one row per duplicate-group with
    the canonical (min) id and the group size."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_dups"))
    )


# _parse_bytes_conf / the under-split guard moved to
# zync_spark.functions.compute (round-11, VERDICT ask #3): the guard is
# now shared by the index families' sync/rebuild paths and the ANN query
# sides. The `_spread` name stays as this module's alias — it predates
# the move and the plan-audit tests pin it.
from zync_spark.functions.compute import (  # noqa: E402
    _parse_bytes_conf,
    ensure_compute_splits as _spread,
)


# Size gate for explicitly broadcasting a per-vector block table (the
# semdedup pair joins): fires only when the SOURCE corpus is provably a
# few MB of parquet (similarity._corpus_bytes — unknown size counts as
# huge). 8 MB compressed vectors ≈ tens of MB of built hash relation,
# the same class the session's 10 MB auto threshold targets; past the
# gate the cluster-hash join is the scale shape (k ~ sqrt(N) >> cores).
_BLOCK_BROADCAST_BYTES = 8 << 20


def _maybe_broadcast(block: DataFrame, source: DataFrame) -> DataFrame:
    from zync_spark.functions.similarity import _corpus_bytes

    if _corpus_bytes(source) < _BLOCK_BROADCAST_BYTES:
        return F.broadcast(block)
    return block


def _hashed_set(text_col: Column, k: int) -> Column:
    """The doc's distinct shingle-hash set as ONE map-side expression:
    tokenize → k-gram shingles → md5-hash each → array_distinct. The set
    (and therefore its size, |A|) exists before anything leaves the task,
    so Jaccard consumers never need a per-doc count shuffle or join."""
    return F.array_distinct(
        F.transform(word_shingles(tokens(text_col), k), md5_long)
    )


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """(doc_id, n_sh, sh) inverted-index rows, carrying the doc's distinct
    shingle-set size on every row. Set construction and dedup happen
    map-side (_hashed_set) — `distinct` costs nothing and is kept only for
    signature compatibility; no shuffle either way. Hashing the shingle to
    a long before the explode keeps shuffle rows narrow downstream.

    explode_outer + IS NOT NULL instead of explode (round 11): a plain
    explode makes Catalyst infer `size(shs) > 0 AND isnotnull(shs)` and
    push BOTH copies of the full tokenize→shingle→md5→distinct tree below
    the _spread exchange to the scan — the heaviest expression in the plan
    evaluated 3x, two of them on the scan's (often single) input split.
    explode_outer infers nothing; the null filter references the GENERATED
    attribute, so it cannot sink. Bag-identical: shingle hashes are
    md5_long of concat_ws strings (never null), so the only null `sh` rows
    are the empty/null-set docs a plain explode drops anyway."""
    per_doc = _spread(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    ).select("doc_id", _hashed_set(F.col("__text"), k).alias("shs"))
    return per_doc.select(
        "doc_id", F.size("shs").alias("n_sh"),
        F.explode_outer("shs").alias("sh"),
    ).filter(F.col("sh").isNotNull())


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_id, sh_set: array<long>) — ZERO shuffles: the distinct set is
    assembled inside the scan task (_hashed_set). Empty sets (docs with
    fewer than k tokens) are dropped, matching the inverted-index path
    where such docs simply have no rows.

    The drop is restated on the CHEAP equivalent `size(tokens) >= k`
    and applied BEFORE the spread (round 12): filtering on
    size(sh_set) > 0 sank below the projection by re-substituting the
    alias, so the ENTIRE tokenize→shingle→md5→distinct tree evaluated a
    second time inside the pushed scan filter — on the scan's single
    split (committed dedup_minhash_lsh before-plan). Equivalent by
    construction: word_shingles yields [] exactly when size(tokens) < k
    (its own CASE guard), md5_long of a shingle is never null, and
    array_distinct of a non-empty array is non-empty — including the
    null-text row (tokens(null) is null, size -1). The filter now costs
    one extra split() per row at the scan and ALSO prunes short docs
    before the exchange; the heavy tree evaluates once, spread."""
    per_doc = _spread(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
        .filter(F.size(tokens(F.col("__text"))) >= k)
    ).select("doc_id", _hashed_set(F.col("__text"), k).alias("sh_set"))
    return per_doc


def _minhash_sig_expr(num_hashes: int) -> Column:
    """MinHash signature of `sh_set` as ONE nested higher-order expression:
    transform over a literal (a,b) permutation array, array_min over the
    permuted set. A single compact expression tree — 64 separate min()
    aggregate buffers (the obvious formulation) cost multiple seconds of
    Catalyst analysis + codegen per query, dominating small-batch runs.

    Built as ONE SQL string through F.expr: the Column-API formulation
    spent ~0.2s per query on 2*num_hashes F.lit py4j round-trips alone
    (measured round 3); a single parse of a ~1 KB expression is ~10x
    cheaper and yields the identical resolved expression."""
    p = MINHASH_PRIME
    params = _perm_params(num_hashes)
    a_list = ",".join(f"{a}L" for a, _ in params)
    b_list = ",".join(f"{b}L" for _, b in params)
    return F.expr(
        f"transform("
        f"  zip_with(array({a_list}), array({b_list}), (a, b) -> struct(a, b)),"
        f"  pr -> array_min(transform(sh_set,"
        f"    s -> ((s % {p}L) * pr.a + pr.b) % {p}L)))"
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard duplicate pairs via inverted index.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    `max_shingle_freq` (scale knob): drop shingles appearing in more than
    this many docs before pairing — bounds the worst-case join fanout
    (Jaccard is then computed over the capped sets).

    Shuffle inventory: set sizes ride the index rows from the map stage
    (doc_shingles), so the ONLY exchanges are the index self-join on the
    shingle hash and the pair aggregation — no distinct pass, no per-doc
    count join.
    """
    sh = doc_shingles(df, id_col, text_col, k)
    if max_shingle_freq is not None:
        from pyspark.sql import Window

        freq_ok = (
            sh.groupBy("sh").agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("sh")
        )
        sh = sh.join(freq_ok, "sh")
        # set sizes must reflect the capped sets (what the join sees)
        sh = sh.withColumn(
            "n_sh", F.count("*").over(Window.partitionBy("doc_id"))
        )
    a = sh.select(F.col("doc_id").alias("id_a"), "sh", F.col("n_sh").alias("n_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), "sh", F.col("n_sh").alias("n_b"))
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_common"),
            F.min("n_a").alias("n_a"),  # constant within the group
            F.min("n_b").alias("n_b"),
        )
    )
    return inter.select(
        "id_a",
        "id_b",
        # Raw long/long division: bit-identical across engines (no
        # round(): its half-way behavior is implementation-defined).
        (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias(
            "jaccard"
        ),
    ).filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 64
) -> DataFrame:
    """(doc_id, sig: array<long>[num_hashes]) MinHash signatures.

    One explode + one groupBy(collect_set) shuffle, then the whole
    permutation family evaluates as one nested higher-order expression per
    doc (see _minhash_sig_expr)."""
    sets = _shingle_sets(df, id_col, text_col, k)
    return sets.select("doc_id", _minhash_sig_expr(num_hashes).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidate generation, exact-Jaccard verified.

    Band the signature into `bands` groups of num_hashes/bands rows; docs
    colliding in any band become candidate pairs (join on the band digest,
    not the raw band values — narrow shuffle keys); candidates are then
    verified with exact Jaccard so the output contains no false positives.
    Output: (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    # ZERO shuffles up to here: the doc's hashed shingle set AND its
    # MinHash signature are both map-side expressions (_shingle_sets,
    # _minhash_sig_expr). Candidate verification then needs no join
    # against exploded shingle rows — just array_intersect on the
    # carried sets.
    sig = _shingle_sets(df, id_col, text_col, k).select(
        "doc_id", "sh_set", _minhash_sig_expr(num_hashes).alias("sig")
    )
    # Both the banding branch and the verification branch consume `sig`;
    # persist so the shingle→signature pipeline materializes once (the
    # ContextCleaner unpersists it once the plan is garbage-collected).
    # The signature table is tiny relative to the corpus: ~64 longs + the
    # hashed shingle set per doc.
    from pyspark import StorageLevel

    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    # Band digests as one higher-order expression: band index `bb` is part
    # of the digest input, so equal row-slices in *different* bands never
    # collide. Joining on a single 32-hex-char string key keeps the
    # shuffle narrow.
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bb: F.md5(
                    F.concat_ws(
                        ",", bb, F.slice("sig", bb * rows_per_band + 1, rows_per_band)
                    )
                ),
            )
        ).alias("bkey"),
    )
    a = band_rows.select(F.col("doc_id").alias("id_a"), "bkey")
    b = band_rows.select(F.col("doc_id").alias("id_b"), "bkey")
    cand = (
        a.join(b, "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Verify candidates ONLY (the point of LSH: exact Jaccard is computed
    # for the handful of colliding pairs, never all pairs): join the two
    # carried shingle sets and intersect them JVM-side.
    sets = sig.select("doc_id", "sh_set")
    inter = F.size(F.array_intersect("set_a", "set_b"))
    scored = (
        cand.join(sets.select(F.col("doc_id").alias("id_a"), F.col("sh_set").alias("set_a")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"), F.col("sh_set").alias("set_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / (F.size("set_a") + F.size("set_b") - inter)).alias("jaccard"),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, nbits: int = 60) -> DataFrame:
    """60-bit SimHash over the token multiset.

    explode(tokens) → explode(bit index) → groupBy(doc, bit) sum(±1) →
    reassemble. Both explodes are map-side; the single shuffle is the
    groupBy on (doc_id, bit) with partial aggregation. 60 bits (not 64)
    keeps the reassembled value positive in signed-64 engines.
    Output: (doc_id, simhash: long).
    """
    tok = (
        _spread(df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")))
        .select("doc_id", F.explode(tokens(F.col("__text"))).alias("tok"))
        .select("doc_id", md5_long(F.col("tok")).alias("h"))
    )
    bits = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("bit"),
        F.col("h"),
    ).select(
        "doc_id",
        "bit",
        # F.shiftright only takes a literal shift amount; the SQL form
        # accepts a column.
        (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("sgn"),
    )
    bit_sums = bits.groupBy("doc_id", "bit").agg(F.sum("sgn").alias("s"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bucket_bits: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    bucket_bits is REQUIRED: >0 selects random-hyperplane sign-bucket LSH
    — pairs are only compared within a bucket, the scale path (`dim` =
    embedding dimensionality for the hyperplanes). bucket_bits=0 is the
    exact all-pairs self-join — QUADRATIC, verification scale only, and
    therefore an explicit opt-in rather than a default a caller can fall
    into silently (round-2 audit finding).
    Output: (id_a, id_b, cos) with cos >= threshold, id_a < id_b.
    """
    from zync_spark.functions.similarity import (dot_expr_dim,
                                                 hyperplane_bucket,
                                                 norm_expr)

    if bucket_bits is None:
        raise ValueError(
            "embedding_neardup_pairs: pass bucket_bits explicitly — "
            "bucket_bits>0 for the LSH-bucketed scale path, or "
            "bucket_bits=0 to opt in to the QUADRATIC exact all-pairs "
            "join (verification scale only)"
        )
    # norms precompute PER VECTOR, not per pair (round 8): the pair
    # count is quadratic within a bucket while vectors are linear, so
    # inlining cosine_expr was recomputing both norms for every
    # candidate — 3x the dot-product work (measured: the memory-cert's
    # gsf10 run sat in exactly this expression). sqrt(dot(v,v)) carried
    # as a column and multiplied is the SAME IEEE value as the inlined
    # sqrt(aa)*sqrt(bb) (ann_query's qn*cn precedent), so the oracle
    # hash-parity is untouched.
    # _spread (round 11): the pair join streams one side — a single-split
    # scan (one parquet row group) would score EVERY candidate pair on one
    # core while the rest idle (the §19.7 under-split trap, here on the
    # batch operator's quadratic side). No-op on real many-file layouts.
    base = _spread(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    base = base.withColumn("vn", norm_expr(F.col("v")))
    if bucket_bits > 0:
        base = base.withColumn(
            "bucket", hyperplane_bucket(F.col("v"), bucket_bits, dim)
        )
        join_on = [F.col("a.bucket") == F.col("b.bucket"), F.col("a.id") < F.col("b.id")]
    else:
        join_on = [F.col("a.id") < F.col("b.id")]
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, join_on)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            # dot_expr_dim: the pair fold restated in the measured-3x
            # interpreted-unrolled form (round 10) — `dim` is already a
            # contract of this operator (the hyperplanes are dim-long)
            (dot_expr_dim(F.col("a.v"), F.col("b.v"), dim)
             / (F.col("a.vn") * F.col("b.vn"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semdedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.45,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means cluster
    blocking + exact within-cluster cosine verification (the published
    SemDeDup recipe — cluster the embedding space, then deduplicate only
    inside each cluster, since cross-cluster pairs are far by
    construction).

    Scale: this is the semantic analog of LSH banding. The corpus shuffles
    once by cluster id (k-means itself never shuffles the corpus — see
    kmeans_assignments); pairwise work is Σ|cluster|², not |corpus|², and
    shrinks as k grows. Verification is exact cosine on the candidate
    pairs only. The k-means init/rounds are deterministic fixed-point
    (identical assignments on every engine), so even the blocking is
    reproducible — no seed drift between runs.

    Output: (cluster, id_a, id_b, cos) with cos >= threshold, id_a < id_b.
    `dim` (optional): declare the embedding dimensionality to score the
    candidate pairs with the measured-3x unrolled cosine form (round 10,
    similarity.dot_expr_dim — bit-identical either way).
    """
    from zync_spark.functions.similarity import (dot_expr_dim,
                                                 kmeans_assignments,
                                                 norm_expr)

    # Persist the (vec_id, cluster) assignment — the narrow minhash-sig
    # idiom (round 12): the lazy frame kmeans_assignments returns carries
    # the final reassignment's k x dim argmin fold as the `cluster`
    # projection, and under constraint propagation (ON in any vanilla
    # session — bench.py disables it, the driver does not) the pair
    # join's inferred isnotnull(cluster) re-substitutes that fold into
    # pushed filters: the costliest expression in the module evaluated
    # 2-3x per row per run. Behind the cache, inference lands on a
    # cached column. Measured with constraint propagation on: 11.5 s →
    # 0.7 s per run at sf0.1, identical 39-pair output. The cache is two
    # longs per vector; the ContextCleaner reclaims it when the plan is
    # garbage-collected (the minhash `sig` precedent).
    from pyspark import StorageLevel

    assign = kmeans_assignments(
        df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    ).select("vec_id", "cluster").persist(StorageLevel.MEMORY_AND_DISK)
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # per-vector norm precompute — same rationale and same IEEE parity
    # argument as embedding_neardup_pairs (pairs are quadratic within a
    # cluster, vectors linear)
    # _spread (round 11): with every join broadcast (tiny dims), the
    # within-cluster pair scoring streams on the SCAN's splits — one row
    # group = one core scoring Σ|cluster|² pairs. Rebalance the streamed
    # side; no-op on real many-file layouts.
    clustered = _spread(assign.join(vecs, "vec_id")).withColumn(
        "vn", norm_expr(F.col("v")))
    a = clustered.select(
        F.col("vec_id").alias("id_a"), "cluster",
        F.col("v").alias("va"), F.col("vn").alias("na"))
    b = clustered.select(
        F.col("vec_id").alias("id_b"), F.col("cluster").alias("cluster_b"),
        F.col("v").alias("vb"), F.col("vn").alias("nb"))
    # Size-gated broadcast of the build side (round 11): size ESTIMATES
    # on the post-join subtree overshoot the 10 MB auto threshold, so
    # the planner fell back to a SortMergeJoin hash-partitioned by
    # cluster — k partitions bound the within-cluster scoring's
    # parallelism to k (k=8 here, on 32 cores), and the cosine fold in
    # the SMJ condition ran in those k tasks. Broadcasting keeps the
    # quadratic scoring on the streamed side's _spread splits. Gated on
    # the corpus' file bytes (the cosine_topk _SMALL_CORPUS_BYTES
    # pattern): at real scale k ~ sqrt(N) dwarfs the core count and the
    # cluster-hash join is the right shape, so the broadcast must not
    # fire there.
    pairs = a.join(
        _maybe_broadcast(b, df),
        (F.col("cluster") == F.col("cluster_b"))
        & (F.col("id_a") < F.col("id_b")))
    return (
        pairs.select(
            "cluster", "id_a", "id_b",
            (dot_expr_dim(F.col("va"), F.col("vb"), dim)
             / (F.col("na") * F.col("nb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def semdedup_pairs_frozen(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """SemDeDup pairs with a FROZEN coarse quantizer — the batch
    equivalent of the incremental embdedup index
    (streaming/embdedup_index.py): assign every vector to its nearest
    centroid by cosine (similarity.ivf_assign, nprobe=1 — the IVF cells
    ARE the SemDeDup blocks), then exact within-cell cosine pairs >=
    threshold, id_a < id_b. Because assignment is a pure function of
    (vector, centroids), this output is independent of how the corpus
    was batched — the split-invariance contract the incremental index
    is differential-tested against.

    Scale: same as semdedup_pairs — pairwise work is Σ|cell|², never
    |corpus|²; assignment is map-side against broadcast centroids."""
    from zync_spark.functions.similarity import (dot_expr_dim,
                                                 ivf_assign, norm_expr)

    dim = len(centroids[0][1]) if centroids else None
    vecs = _spread(df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )).withColumn("vn", norm_expr(F.col("v")))
    assigned = ivf_assign(vecs, centroids, "v", nprobe=1)
    a = assigned.select(F.col("vec_id").alias("id_a"),
                        F.col("__cell").alias("cell"),
                        F.col("v").alias("va"), F.col("vn").alias("na"))
    b = assigned.select(F.col("vec_id").alias("id_b"),
                        F.col("__cell").alias("cell_b"),
                        F.col("v").alias("vb"), F.col("vn").alias("nb"))
    return (
        a.join(_maybe_broadcast(b, df),
               (F.col("cell") == F.col("cell_b"))
               & (F.col("id_a") < F.col("id_b")))
        .select(
            "cell", "id_a", "id_b",
            # dim is a property of the frozen quantizer — the 3x
            # unrolled scoring form applies automatically (round 10)
            (dot_expr_dim(F.col("va"), F.col("vb"), dim)
             / (F.col("na") * F.col("nb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def crossdoc_duplication(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document fraction of its distinct k-gram shingles that occur in
    at least one OTHER document — the cross-corpus boilerplate signal
    (RefinedWeb/Dolma-style duplicated-n-gram fraction). Distinct from
    text.repetition_ratio, which measures repetition WITHIN a document:
    a page is flagged here when its content is shared across the corpus
    (templates, navigation chrome, licence footers), even if each copy is
    locally clean.

    Scale: pure inverted index — shingle-HASH rows (16 bytes) shuffle once
    by shingle for the document-frequency window and once by doc_id for
    the fraction; document text never leaves the scan task. No pairwise
    join at all (unlike jaccard_pairs): cost is linear in total shingles.

    Output: (doc_id, n_shingles, n_dup, dup_fraction) for docs with >= k
    tokens.
    """
    from pyspark.sql import Window

    sh = doc_shingles(df, id_col, text_col, k)
    w = Window.partitionBy("sh")
    tagged = sh.withColumn("df_", F.count("*").over(w))
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df_") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id", "n_shingles", "n_dup",
            (F.col("n_dup") / F.col("n_shingles")).alias("dup_fraction"),
        )
    )


def window_hash_rows(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(doc_id, pos, h) — one row per `window`-token sliding window, h =
    md5-60bit of the window's lowercased text. THE shared window
    primitive: duplicate_spans consumes it batch-side and
    streaming/span_index.py delta-side, so the incremental index and the
    batch operator can never disagree on what a window is. Tokenize +
    per-window md5 is CPU-dense per-row expansion, so the scan takes the
    module's _spread under-split guard (a no-op on real many-file
    layouts); text never leaves the scan task.

    explode_outer + IS NOT NULL (round 11, the doc_shingles fix): plain
    explode let Catalyst infer size>0/isnotnull over the whole window-md5
    array and push it below the _spread to the scan — the O(tokens)
    md5-per-window expression evaluated 3x, twice on the unspread input.
    Window structs are never null (struct() of non-null fields), so
    filtering the generated attribute is bag-identical."""
    # The size(t) >= window guard is a WHEN inside the generator input,
    # not a Filter (round 12): a filter on the alias sinks below the
    # projection by re-substituting the tokenize — the regex split ran
    # TWICE per row, once in the pushed scan filter and once in the
    # projection (read from the committed dedup_substring_spans before-
    # plan). A short doc now yields a null array, which explode_outer
    # turns into the one null row the IS NOT NULL already drops — the
    # exact rows the old filter removed. (sequence() would count DOWN
    # for size(t) < window, so the guard is also what keeps the window
    # positions well-formed.)
    return (
        _spread(df.select(F.col(id_col).alias("doc_id"),
                          F.col(text_col).alias("__text")))
        .select("doc_id", tokens(F.lower(F.col("__text"))).alias("t"))
        .select(
            "doc_id",
            F.explode_outer(
                F.when(
                    F.size("t") >= window,
                    F.transform(
                        F.sequence(F.lit(0), F.size("t") - window),
                        lambda i: F.struct(
                            i.alias("pos"),
                            md5_long(
                                F.concat_ws(
                                    " ",
                                    F.slice(F.col("t"), i + 1, F.lit(window))
                                )
                            ).alias("h"),
                        ),
                    ),
                )
            ).alias("w"),
        )
        .filter(F.col("w").isNotNull())
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN detection (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find every maximal run of
    tokens that appears verbatim in >= `min_docs` distinct documents, as
    token-position spans per document. This is the surgical complement to
    the whole-document families above — boilerplate headers, licence
    blocks, and quoted passages are REGIONS of otherwise-unique documents,
    and span-level output is what a removal pass needs.

    Algorithm (the distributed stand-in for the paper's suffix array,
    which is inherently single-machine):
      1. slide a `window`-token window over each document; hash each
         window's text (md5-60bit — cross-engine reproducible);
      2. inverted index: one shuffle of (hash, doc, pos) rows grouped by
         hash keeps hashes seen in >= min_docs distinct docs;
      3. join positions back on the surviving hashes;
      4. gaps-and-islands per doc (pos - row_number) merges overlapping/
         adjacent windows into maximal spans of >= `window` tokens.
    Two equal-length windows match iff their texts are equal, so the
    result is exactly "all maximal duplicated substrings of length >=
    window tokens" — the paper's MinLen knob.

    Scale: document text never shuffles — only 16-byte (hash, id, pos)
    rows, ~one per token, shuffle once for the document-frequency group
    and once (the surviving subset) for the per-doc island merge.
    Cost is O(total tokens), same posture as crossdoc_duplication; no
    pairwise join, no suffix-array global sort. Ultra-frequent windows
    cost df(w) rows each (linear, not quadratic — positions are grouped,
    never self-joined), so no max-freq guard is needed.

    Output: (doc_id, span_start, span_end, span_tokens) — token positions
    0-based inclusive; only documents containing at least one duplicated
    span appear.
    """
    wins = window_hash_rows(df, id_col, text_col, window)
    # A window is duplicated when it occurs >= 2 times anywhere AND in
    # >= min_docs distinct docs — so min_docs=1 means "repeated, possibly
    # within one document" (the paper's self-repeat case) and min_docs=2
    # (default) means strictly cross-document.
    dup_h = (
        wins.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.count(F.lit(1)).alias("nt"),
        )
        .filter((F.col("nd") >= min_docs) & (F.col("nt") >= 2))
        .select("h")
    )
    hits = wins.join(dup_h, "h").select("doc_id", "pos")
    return merge_islands(hits, window)


def merge_islands(hits: DataFrame, window: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated window POSITIONS into maximal
    spans: (doc_id, pos) rows → (doc_id, span_start, span_end,
    span_tokens), span_end = last window start + window - 1. One shuffle
    keyed by doc_id (the hits subset, not the corpus). Shared by the
    batch operators here and streaming/span_index.spans_view, so the two
    can never disagree on what a maximal span is."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn("isl", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window - 1).alias("span_end"),
        )
        .select(
            "doc_id", "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The removal pass over `duplicate_spans` output (the ExactSubstr
    cleanup itself): drop every token that falls inside a duplicated
    span and reassemble the document. Removal is total — every
    occurrence goes, the conservative variant of Lee et al.'s
    cut-all-but-one (which needs a cross-document canonical-copy
    election; at corpus scale the duplicated mass is boilerplate where
    keeping zero copies is the curation intent).

    Matching is case-insensitive (spans come from lowered text) but
    positions index the ORIGINAL tokens, so reassembly preserves case.
    Whitespace is normalized to single spaces — the same canonicalization
    every hash in this module applies.

    Scale: duplicate_spans' posture plus one doc_id-keyed join of the
    span list back to the corpus (spans exist only for affected docs)
    and a per-row JVM higher-order filter — token surgery never leaves
    whole-stage codegen, no Python, no extra corpus shuffle beyond the
    join.

    Output: (doc_id, n_tokens, n_removed, text) where text is the
    cleaned document ('' when everything was duplicated).
    """
    spans = duplicate_spans(df, id_col, text_col, window, min_docs)
    return remove_spans(df, spans, id_col, text_col)


def remove_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Apply a token-position span set to a corpus: drop every token
    whose position falls inside any of its document's spans, reassemble.
    `spans` is any (doc_id, span_start, span_end, ...) frame —
    duplicate_spans output, span_index.spans_view, contaminated_spans —
    positions indexing the whitespace tokens of `text_col` (the shared
    text.tokens contract). Overlapping spans remove each position once.

    Scale: one doc_id-keyed join of per-doc span lists back to the
    corpus (spans exist only for affected docs) and a per-row JVM
    higher-order filter — token surgery never leaves whole-stage
    codegen, no Python, no extra corpus shuffle beyond the join.

    Output: (doc_id, n_tokens, n_removed, text) — every input document
    appears; text is whitespace-normalized, '' when everything was
    removed."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"),
                     F.col("span_end").alias("e"))
        ).alias("__spans")
    )
    base = _spread(
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(text_col).alias("__text"))
    ).select("doc_id", tokens(F.col("__text")).alias("__t"))
    j = base.join(per_doc, "doc_id", "left")
    kept = F.transform(
        F.filter(
            F.transform(
                "__t", lambda tok, i: F.struct(tok.alias("tok"), i.alias("i"))
            ),
            lambda x: ~F.exists(
                F.coalesce("__spans", F.array()),
                lambda sp: (x["i"] >= sp["s"]) & (x["i"] <= sp["e"]),
            ),
        ),
        lambda x: x["tok"],
    )
    return j.select(
        "doc_id",
        F.size("__t").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("text"),
    )


def contaminated_spans(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    window: int = 8,
) -> DataFrame:
    """Spans of training documents that appear VERBATIM (window-token
    runs, case-insensitive) anywhere in an evaluation/benchmark set —
    the span-level decontamination that SURGICALLY excises leaked test
    text instead of dropping whole documents (the text_decontaminate /
    bloom / n-gram entries flag docs; this one says exactly WHAT to cut,
    and `remove_spans` cuts it).

    Scale: the benchmark side is tiny next to a training corpus, so its
    distinct window-hash set BROADCASTS and the whole check is a
    map-side semi join over the training windows + the island merge —
    the corpus' text never shuffles, and the only data-proportional
    exchange is the hits subset keyed by doc (merge_islands). The
    duplication rule needs no document-frequency group at all here:
    membership in the benchmark set IS the rule.

    Output: (doc_id, span_start, span_end, span_tokens) over `df`.
    """
    wins = window_hash_rows(df, id_col, text_col, window)
    bwins = window_hash_rows(
        bench_df, bench_id_col or id_col, bench_text_col or text_col, window
    ).select("h").distinct()
    hits = wins.join(F.broadcast(bwins), "h").select("doc_id", "pos")
    return merge_islands(hits, window)
