"""Incrementally maintained embedding near-dup (SemDeDup) index — the
FIFTH index family (round 8).

The batch operators (`functions.dedup.semdedup_pairs`,
`functions.dedup.embedding_neardup_pairs`) re-cluster and re-compare the
WHOLE corpus on every call — O(corpus) per invocation. A re-crawling
training-data pipeline ingesting embeddings continuously needs the
incremental formulation, and the machinery already exists in the other
four families — this module composes it:

- the k-means blocks ARE IVF cells: the coarse quantizer (fixed-point
  `similarity.kmeans_centroids`, bit-identical on every engine) trains
  ONCE on the first sync's delta (the backfill) and is FROZEN as stored
  `centroid` rows — exactly `streaming.ann_index`'s contract (rebuild to
  retrain). SemDeDup's published recipe clusters the embedding space and
  deduplicates only within clusters; with frozen centroids, a vector's
  block is a pure function of (vector, centroids), so incremental
  assignment is map-side and split-invariant.
- each maintenance pass assigns only the DELTA's vectors to their
  nearest cell and emits near-dup pairs (exact within-cell cosine >=
  threshold) from (new x new) within the batch plus (new x stored) via a
  cell-bounded probe — `scan(bounds={"ckey": [probed cells]})`, the same
  file-skipping read as `ann_query`. A pair is discovered exactly once,
  when its LATER member arrives, so the pair set over ANY batch split is
  IDENTICAL to the batch computation with the same frozen centroids
  (`functions.dedup.semdedup_pairs_frozen` — differential-tested, and
  hash-checked against a DuckDB oracle replaying the fixed-point
  training on the backfill slice).
- vec rows, pair rows, centroid rows, and advanced cursors commit in ONE
  atomic manifest (`Pool.load(cursors=, occ_token=)`) — crash-safe,
  rerun = no-op, the dedup-index durability argument verbatim.

Storage layout (all file-skippable, co-tenant-safe):
  'c:'          centroid rows (cid, cv)            — the frozen blocks
  'l:<cell>'    vec rows (vec_id, v, vn, cell)     — ann_index's bucketing
  'p:<xx>'      neardup pair rows (cell, id_a, id_b, cos), bucketed by
                pmod(id_a) like the dedup family's pairs
  'x:<xx>'      tombstones (streaming.tombstones)  — delete/upsert masking

zed_types reuse the shared vocabulary ('centroid'/'vec' like ann,
'duppair' like dedup — per-topic masking keeps families separate), so
`fold_tombstones`, `check_pool_health`, and `fold_compact` serve this
family with ZERO changes: a pair dies when EITHER member dies, a vec row
when its id dies, exactly the co-tenant contract the round-7 retention
machinery enforces pool-wide.

Reference parity: the reference has no dedup or index surface at all
(beyond-reference); the commit/cursor machinery mirrors its done-marker
design (README.md:447-455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.functions.compute import ensure_compute_splits
from zync_spark.functions import similarity as S
from zync_spark.pool import Pool
from zync_spark.streaming.ann_index import (_cell_ckey, _is_centroid,
                                            _rebuild_assign,
                                            _is_vec, stored_centroids)
from zync_spark.streaming.dedup_index import (_PREFIX_LEN, _envelope,
                                              _stamp, pmod_ckey)
from zync_spark.streaming.incremental import _spec_cursors, scan_delta


class EmbDedupIndexSpec:
    """Declarative index definition. `id_expr`/`vec_expr`: SQL
    expressions over the source pool's rows producing the vector id
    (long) and the embedding (array). n_cells/iterations mirror the ANN
    family's coarse quantizer (the cells ARE the SemDeDup blocks);
    `threshold` is the within-cell cosine floor for a near-dup claim —
    a per-pass verification-policy knob (like the dedup family's), NOT
    burned into stored rows. `prefix_len` sets the pair/tombstone bucket
    fan-out (fixed for the index's life, same rule as dedup)."""

    def __init__(self, name: str, id_expr: str, vec_expr: str,
                 n_cells: int = 16, iterations: int = 2,
                 threshold: float = 0.45, min_train: int | None = None,
                 prefix_len: int = _PREFIX_LEN,
                 attrs: dict[str, str] | None = None):
        if not 1 <= n_cells <= 65536:
            raise ValueError("n_cells must be 1..65536")  # _cell_ckey width
        if not 1 <= prefix_len <= 8:
            raise ValueError("prefix_len must be 1..8 hex chars")
        self.name = name
        self.topic = f"embdedup:{name}"
        self.id_expr = id_expr
        self.vec_expr = vec_expr
        self.n_cells = n_cells
        self.iterations = iterations
        self.threshold = threshold
        self.min_train = min_train
        self.prefix_len = prefix_len
        # metadata co-location (round 8, shared surface —
        # streaming/attrs.py); filter resolution via attr_ids below
        self.attrs = dict(attrs) if attrs else {}

    # duck-types RollupSpec for _spec_cursors' key namespace
    @property
    def keys(self):  # pragma: no cover - structural only
        return {"vec_id": self.id_expr}


def _is_pair(spec: EmbDedupIndexSpec):
    return (F.col("zed_type").eqNullSafe("duppair")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def _cos(va, na, vb, nb, dim=None):
    """dot/(|a||b|) from precomputed norms — the operand shape ann_query
    uses; multiplication and the position-ordered dot fold are bit-exact
    regardless of which side is the newer document, so canonical
    (id_a < id_b) pairs hash identically however they were discovered.
    `dim` (the frozen quantizer's, when known) selects the measured-3x
    unrolled scoring form — bit-identical (similarity.dot_expr_dim,
    round 10): within-cell scoring is THE constant-factor ceiling of
    every sync/rebuild pass (SCALING §18.5)."""
    return S.dot_expr_dim(va, vb, dim) / (na * nb)


def _pairs_expr(new: DataFrame, old: DataFrame | None,
                dim: int | None) -> DataFrame:
    """EXPRESSION-path pair scoring — the original formulation, shared
    by the small-k path (token-identical plan) and the kernel path's
    degenerate-row fallback. `new`: (vec_id, v, vn, cell); `old`
    (optional): (old_id, vo, no, cell_o). Returns UNFILTERED
    (cell, id_a, id_b, cos) rows: new x new within a cell (each vector
    lives in exactly ONE cell under nprobe=1, so a pair surfaces
    through exactly one cell — no distinct needed), plus new x stored
    with the pair discovered when the LATER member arrives (canonical
    smaller id first; the cosine is operand-order-exact — see _cos)."""
    na = new.select(F.col("vec_id").alias("id_a"), "cell",
                    F.col("v").alias("va"),
                    F.col("vn").alias("na"))
    nb = new.select(F.col("vec_id").alias("id_b"),
                    F.col("cell").alias("cell_b"),
                    F.col("v").alias("vb"),
                    F.col("vn").alias("nb"))
    nn = (na.join(nb, (F.col("cell") == F.col("cell_b"))
                  & (F.col("id_a") < F.col("id_b")))
          .select("cell", "id_a", "id_b",
                  _cos(F.col("va"), F.col("na"),
                       F.col("vb"), F.col("nb"),
                       dim).alias("cos")))
    if old is None:
        return nn
    no = (new.join(old, (F.col("cell") == F.col("cell_o"))
                   & (F.col("vec_id") != F.col("old_id")))
          .select(
              "cell",
              F.least("vec_id", "old_id").alias("id_a"),
              F.greatest("vec_id", "old_id").alias("id_b"),
              _cos(F.col("v"), F.col("vn"),
                   F.col("vo"), F.col("no"),
                   dim).alias("cos")))
    return nn.unionByName(no)


def _pairable(vc: str, nc: str, idc: str, dim: int):
    """Rows the Arrow pair kernel can score with EXACT expression-path
    parity: non-null id and norm, vector of exactly the quantizer's
    dim with no null elements. Everything else routes to the
    expression fallback — see _emit_pairs. NaN elements stay HERE (the
    expression path scores them to NaN cos, which `>= threshold` KEEPS
    under Spark's NaN-greatest semantics, and the kernel reproduces);
    null elements must NOT (they score to null cos = dropped, but
    Arrow→pandas renders them as the same NaN — JVM-side isnull is the
    only place the two are distinguishable). Never null: false AND
    null = false, and the exists() is coalesced."""
    return (F.col(idc).isNotNull() & F.col(nc).isNotNull()
            & F.col(vc).isNotNull() & (F.size(F.col(vc)) == int(dim))
            & ~F.coalesce(F.exists(F.col(vc), lambda x: x.isNull()),
                          F.lit(False)))


def _emit_pairs(new: DataFrame, old: DataFrame | None, dim: int,
                threshold: float, k: int,
                est_rows: int | None = None) -> DataFrame:
    """Near-dup pair emission with the engine's kernel gate (round 11):
    past _KMEANS_ARROW_K cells the grouped numpy kernel
    (similarity.pair_cos_arrow) replaces the expression self-join —
    Σ|cell|² interpreted dots were the rebuild's dominant remaining
    cost (VERDICT r10 ask #2) — below it the expression path keeps the
    catalog entries' pinned plans. Returns THRESHOLD-FILTERED pairs
    either way (the small-k filter is the original `cos >= t` Column —
    NaN kept, null dropped — and the kernel replays exactly that).

    Parity decomposition on the kernel path: pairable rows (see
    _pairable) score in the kernel; degenerate rows pair only among
    THEMSELVES through the original expression join (a degenerate x
    pairable pair can never survive: a wrong-length member null-pads
    the dot fold to null, a null element nulls the unrolled sum, a
    null id nulls the join predicate — all dropped), so the union is
    the exact expression bag. SPARK_GRAFT_NO_PAIR_ARROW=1 disables the
    kernel (A/B measurement kill-switch).

    `est_rows` (round 11, measured): the pair workload is
    Sigma|cell|^2 ~ est_rows^2 / k — a function of delta FATNESS, not
    k. A 110k-doc backfill on a 64-cell quantizer sits at the k-gate
    yet pays ~190M expression-scored pairs (240-315 s inside the
    sync's commit), so a caller that knows its delta's row count also
    engages the kernel when the estimate crosses
    similarity._PAIR_ARROW_MIN_PAIRS. Catalog fixtures stay orders
    below it (pinned plans intact), and the estimate only picks the
    path — both paths are bag-exact (test_pair_cos_arrow_parity)."""
    import os

    fat = (est_rows is not None
           and est_rows * est_rows / max(k, 1) >= S._PAIR_ARROW_MIN_PAIRS)
    if ((k <= S._KMEANS_ARROW_K and not fat)
            or os.environ.get("SPARK_GRAFT_NO_PAIR_ARROW")):
        return _pairs_expr(new, old, dim).filter(
            F.col("cos") >= threshold)
    ok_new = _pairable("v", "vn", "vec_id", dim)
    combined = new.filter(ok_new).select(
        "cell", "vec_id", "v", "vn", F.lit(0).alias("__old"))
    bad_new = new.filter(~ok_new)
    bad_old = None
    if old is not None:
        ok_old = _pairable("vo", "no", "old_id", dim)
        combined = combined.unionByName(
            old.filter(ok_old).select(
                F.col("cell_o").alias("cell"),
                F.col("old_id").alias("vec_id"),
                F.col("vo").alias("v"),
                F.col("no").alias("vn"),
                F.lit(1).alias("__old")))
        bad_old = old.filter(~ok_old)
    fast = S.pair_cos_arrow(combined, dim, threshold)
    slow = _pairs_expr(bad_new, bad_old, dim).filter(
        F.col("cos") >= threshold)
    return fast.unionByName(slow)


def _check_plen(dest: Pool, spec: EmbDedupIndexSpec) -> None:
    """prefix_len is FIXED for the life of an index (stored 'p:'/'x:'/
    'a:' ckeys embed it): a drifted spec would not error — it would
    bucket new rows under a different fan-out and silently miss stored
    pairs in point lookups. Validate against the width of any stored
    pair bucket (one bounded limit-1 read; the dedup family's bootstrap
    rule, dedup_index._check_meta)."""
    if not dest.commits():
        return
    df = dest.scan(bounds={"ckey": ("p:", "p:g")})
    if df is None or "ckey" not in df.columns:
        return
    sample = (df.filter(F.col("kafka.topic").eqNullSafe(spec.topic)
                        & F.col("ckey").startswith("p:"))
              .select("ckey").limit(1).collect())
    if sample and len(sample[0]["ckey"]) - 2 != spec.prefix_len:
        raise ValueError(
            f"embdedup index {spec.name!r}: stored ckeys are "
            f"{len(sample[0]['ckey']) - 2} hex chars wide but the spec "
            f"says prefix_len={spec.prefix_len} — fixed for the life of "
            "an index; rebuild the index to change it")


def sync_embdedup(src: Pool, dest: Pool, spec: EmbDedupIndexSpec,
                  topics: list[str], message: str | None = None,
                  stats_out: dict | None = None,
                  auto_compact_every: int | None = None,
                  upsert: bool = False) -> int:
    """One incremental maintenance pass. The FIRST pass trains the
    quantizer on its delta (the backfill; `min_train` defers like the
    ANN family) and commits centroid rows; every pass assigns its delta
    map-side, emits near-dup pairs against the batch and the probed
    stored cells, and commits rows+cursors atomically. Returns rows
    appended (0 = no new vectors; reruns are no-ops).

    `stats_out` receives live_files/probe_files — the cell-bounded probe
    contract under test. `upsert=True`: one-call CDC, same semantics as
    the other families (within-batch version collapse, same-commit
    tombstones, probe masking via with_upserts). `auto_compact_every`:
    fold+recluster cadence, single-writer maintenance only."""
    n = _sync_once(src, dest, spec, topics, message, stats_out,
                   upsert=upsert)
    if (n and auto_compact_every
            and dest.commits_since_base() >= auto_compact_every):
        compact_embdedup(dest)
    return n


def _sync_once(src: Pool, dest: Pool, spec: EmbDedupIndexSpec,
               topics: list[str], message: str | None,
               stats_out: dict | None, upsert: bool = False) -> int:
    # phase decomposition (round 10, the §18.1 method): each sec_* ends
    # at the Spark action that materializes the phase — sec_delta at the
    # cursor collect (materializes the persisted delta), sec_assign at
    # the probed-cells collect (materializes the persisted assignment),
    # sec_commit at the load (scores pairs + writes + publishes)
    import time as _time

    _t = {"t": _time.perf_counter()}

    def _stamp_sec(key: str) -> None:
        now = _time.perf_counter()
        if stats_out is not None:
            stats_out[key] = round(now - _t["t"], 3)
        _t["t"] = now

    _check_plen(dest, spec)
    snapshot = len(dest.commits())
    cursors = _spec_cursors(spec, dest.stored_cursors(), topics)
    delta = scan_delta(src, cursors, topics)
    if delta is None:
        return 0
    delta = delta.persist()
    try:
        # per-partition max offset AND row count in the one job the
        # cursor bookkeeping already pays — the count feeds the pair
        # kernel's workload gate (est_rows below) for free
        cur_rows = delta.groupBy(
            F.col("kafka.topic").alias("t"),
            F.col("kafka.partition").alias("p"),
        ).agg(F.max(F.col("kafka.offset")).alias("mx"),
              F.count("*").alias("cnt")).collect()
        new_cursors = {
            f"{spec.topic}|{r['t']}#{int(r['p'])}": int(r["mx"]) + 1
            for r in cur_rows
        }
        n_delta = sum(int(r["cnt"]) for r in cur_rows)
        _stamp_sec("sec_delta")
        if not new_cursors:
            return 0
        src_rows = delta
        tombs_new = None
        if upsert:
            from zync_spark.streaming.tombstones import keep_latest_versions

            src_rows = keep_latest_versions(delta, spec.id_expr)
            tombs_new = src_rows.select(
                F.expr(spec.id_expr).cast("long").alias("did"))
        vecs = (
            src_rows.select(
                F.expr(spec.id_expr).cast("long").alias("vec_id"),
                F.expr(spec.vec_expr).alias("v"),
            )
            .filter(F.col("v").isNotNull() & (F.size("v") > 0))
        )
        cents = stored_centroids(dest, spec)
        cent_rows = None
        if cents is None:
            n_vecs = vecs.count()
            if spec.min_train is not None and 0 < n_vecs < spec.min_train:
                import warnings

                warnings.warn(
                    f"embdedup index {spec.name!r}: deferring quantizer "
                    f"training ({n_vecs} < min_train={spec.min_train} "
                    "vectors in the first delta)", stacklevel=2)
                return 0  # cursors unmoved: the delta keeps accreting
            if 0 < n_vecs < spec.n_cells * 8:
                import warnings

                warnings.warn(
                    f"embdedup index {spec.name!r}: training the FROZEN "
                    f"blocks on only {n_vecs} vectors for "
                    f"{spec.n_cells} cells (< 8/cell) — consider "
                    "min_train, or rebuild_embdedup once the corpus "
                    "grows", stacklevel=2)
            # ensure_compute_splits on the TRAINING input (round 11,
            # measured): the packed delta read lands the backfill in
            # one partition — right for IO, and exactly the §19.7 trap
            # for the Lloyd rounds' O(rows x k x dim) scoring, which
            # ran single-task (110k-doc backfill at 64 cells: 278 s of
            # sec_assign with 31 cores idle). First pass only — steady-
            # state syncs skip this branch entirely.
            cents = S.kmeans_centroids(
                ensure_compute_splits(vecs), k=spec.n_cells,
                iterations=spec.iterations,
                id_col="vec_id", vec_col="v")
            if cents:
                cent_rows = delta.sparkSession.createDataFrame(
                    [(cid, vec) for cid, vec in cents],
                    "cid long, cv array<double>")
        out = None
        pair_rows = None
        if cents:
            dim = len(cents[0][1])
            # Spread the assignment input (round 10, measured): the
            # engine's packed pool read lands a small delta in ONE
            # partition — right for IO, but nearest-cell assignment is
            # O(rows x n_cells x dim) interpreted CPU, the heaviest
            # map-side work of the pass, and it ran single-task (12.2
            # CPU-seconds = 12.4 s WALL at 10k rows x 332 cells while
            # 31 cores idled). The tiny round-robin shuffle is orders
            # below the compute it parallelizes; an already-parallel
            # delta skips it.
            inp = ensure_compute_splits(
                vecs.select("vec_id", "v",
                            S.norm_expr(F.col("v")).alias("vn")))
            # ivf_assign_fast (round 11): past the Arrow gate the
            # bit-identical numpy kernel replaces the interpreted
            # k x dim scoring — the sync's heaviest map-side pass once
            # the quantizer is resize-scale
            new = S.ivf_assign_fast(inp, cents, "v").select(
                "vec_id", "v", "vn",
                F.col("__cell").alias("cell")).persist()
            pairs = None
            try:
                # new x stored probe scope: ONLY the delta's cells' files
                # — the cell list is a <= n_cells metadata collect
                # (ann_query's probe shape); stored vectors in other
                # cells cannot share a block, so skipping their files
                # loses nothing
                cells = sorted({
                    int(r["c"]) for r in
                    new.select(F.col("cell").alias("c")).distinct().collect()
                })
                _stamp_sec("sec_assign")
                ckeys = ["l:%04x" % c for c in cells]
                if stats_out is not None:
                    stats_out["live_files"] = len(dest.committed_files())
                    stats_out["probe_files"] = len(
                        dest.committed_files(bounds={"ckey": ckeys}))
                stored = dest.scan(bounds={"ckey": ckeys})
                old = None
                if stored is not None and "vec_id" in stored.columns:
                    from zync_spark.streaming.tombstones import (read_tombs,
                                                                 with_upserts)

                    tombs = read_tombs(dest, spec.topic)
                    if upsert and tombs_new is not None:
                        # superseded versions of THIS pass's ids must not
                        # pair against the delta — mask them at probe time
                        tombs = with_upserts(tombs, tombs_new, snapshot)
                    from zync_spark.streaming.tombstones import mask_rows

                    old = mask_rows(
                        stored.filter(_is_vec(spec)
                                      & F.col("ckey").isin(ckeys)),
                        tombs, "vec_id"
                    ).select(F.col("vec_id").alias("old_id"),
                             F.col("cell").alias("cell_o"),
                             F.col("v").alias("vo"),
                             F.col("vn").alias("no"))
                # within-batch (new x new) plus new x stored pairs,
                # threshold-filtered; past the kernel gate — k OR the
                # delta-fatness estimate — the grouped numpy scorer
                # replaces the expression self-join (round 11 — see
                # _emit_pairs; n_delta bounds the vec count from the
                # cursor agg's free count)
                # fence (the §18.1 pattern, measured round 11): the
                # commit's load pays TWO materializations of its input
                # (its count job, then the write), and pair scoring is
                # the DAG's dominant compute — uncached it ran twice
                # inside sec_commit. The survivor set is small by the
                # threshold's design; the cache fills on the count pass
                # and the write reads it.
                pairs = _emit_pairs(new, old, dim, spec.threshold,
                                    k=len(cents),
                                    est_rows=n_delta).persist()
                vec_out = _stamp("vec", _cell_ckey(F.col("cell")), new)
                pair_rows = _stamp(
                    "duppair",
                    pmod_ckey("p:", F.col("id_a"), spec.prefix_len), pairs)
                out = vec_out.unionByName(pair_rows,
                                          allowMissingColumns=True)
                if cent_rows is not None:
                    out = _stamp("centroid", F.lit("c:"),
                                 cent_rows).unionByName(
                        out, allowMissingColumns=True)
                if spec.attrs:
                    # index-resident metadata in the shared 'a:' key
                    # space (streaming/attrs.py)
                    from zync_spark.streaming.attrs import attr_rows

                    out = out.unionByName(attr_rows(spec, src_rows),
                                          allowMissingColumns=True)
                if tombs_new is not None:
                    from zync_spark.streaming.tombstones import tomb_rows

                    out = out.unionByName(
                        tomb_rows(delta.sparkSession, tombs_new,
                                  upto=snapshot,
                                  prefix_len=spec.prefix_len),
                        allowMissingColumns=True)
                n = 0
                if out is not None:
                    # ckey-clustered commit (per-file stats at load):
                    # cell/pair/tomb spaces land in separate files, so
                    # bounded probes skip this commit's non-matching
                    # files immediately
                    n = dest.load(_envelope(spec, out, snapshot),
                                  message or f"{spec.topic} sync",
                                  cursors=new_cursors, occ_token=snapshot,
                                  cluster_by=["ckey"])
                    _stamp_sec("sec_commit")
                if n == 0:
                    return _cursor_only(dest, spec, delta, new_cursors,
                                        snapshot, message)
                return n
            finally:
                new.unpersist()
                if pairs is not None:
                    pairs.unpersist()
        # nothing indexable (no vectors and nothing trained): advance the
        # cursor via a tombstone so later passes don't re-scan forever —
        # but the delta's attr rows (and upsert tombstones) still commit
        # with it: the advance is permanent, so dropping them here would
        # silently exclude these docs from attr-filtered retrieval for
        # the index's life (round-8 ADVICE)
        return _cursor_only(dest, spec, delta, new_cursors, snapshot,
                            message, src_rows=src_rows, tombs_new=tombs_new)
    finally:
        delta.unpersist()


def _cursor_only(dest: Pool, spec: EmbDedupIndexSpec, delta: DataFrame,
                 new_cursors: dict, snapshot: int, message: str | None,
                 src_rows: DataFrame | None = None,
                 tombs_new: DataFrame | None = None) -> int:
    """Advance cursors for a pass that indexed no vectors. NOT
    necessarily row-free: when the spec declares attrs (or the pass ran
    in upsert mode), the delta's attr/tombstone rows commit alongside
    the cursor marker — a delta consumed before the quantizer trains
    must not permanently lose its metadata."""
    tomb = delta.sparkSession.createDataFrame(
        [((spec.topic, 0, 0), "cursors")],
        "kafka struct<topic:string,partition:long,offset:long>,"
        " zed_type string",
    )
    extra = None
    if spec.attrs and src_rows is not None:
        from zync_spark.streaming.attrs import attr_rows

        extra = attr_rows(spec, src_rows)
    if tombs_new is not None:
        from zync_spark.streaming.tombstones import tomb_rows

        trows = tomb_rows(delta.sparkSession, tombs_new, upto=snapshot,
                          prefix_len=spec.prefix_len)
        extra = (trows if extra is None else
                 extra.unionByName(trows, allowMissingColumns=True))
    if extra is None:
        return dest.load(tomb, message or f"{spec.topic} sync",
                         cursors=new_cursors, occ_token=snapshot)
    out = tomb.unionByName(_envelope(spec, extra, snapshot),
                           allowMissingColumns=True)
    return dest.load(out, message or f"{spec.topic} sync",
                     cursors=new_cursors, occ_token=snapshot,
                     cluster_by=["ckey"])


def tombstone_embdedup(dest: Pool, spec: EmbDedupIndexSpec, ids) -> int:
    """Delete vectors from the index's LATEST state — O(1 commit), no
    read of the stored cells: a tombstone per id masks its vec rows and
    every pair EITHER of whose members is masked (a near-dup claim about
    a dead document is dead — fold_tombstones' pair rule, shared with
    the dedup family). UPDATE flow (CDC): tombstone FIRST, then publish
    the new embedding and sync — or use sync_embdedup(upsert=True).
    Returns rows committed."""
    from zync_spark.streaming.tombstones import commit_with_retry, tomb_rows

    def build(seq: int) -> DataFrame:
        rows = tomb_rows(dest.spark, ids, upto=seq,
                         prefix_len=spec.prefix_len)
        return _envelope(spec, rows, seq)

    return commit_with_retry(dest, build, f"{spec.topic} tombstone")


def compact_embdedup(dest: Pool, target_rows: int = 4_000_000,
                     message: str = "embdedup compact") -> int:
    """Range-cluster the index pool by ckey (cell-bounded probes then
    skip at FILE granularity) and fold tombstones — identical contract
    to compact_ann; the family-agnostic fold handles the pair rows."""
    from zync_spark.streaming.tombstones import fold_tombstones

    return dest.compact(target_rows=target_rows, message=message,
                        transform=fold_tombstones, cluster_by=["ckey"])


def rebuild_embdedup(dest: Pool, spec: EmbDedupIndexSpec,
                     n_cells: int | None = None,
                     iterations: int | None = None,
                     threshold: float | None = None,
                     target_rows: int = 4_000_000,
                     message: str = "embdedup rebuild",
                     init: str = "modulo",
                     stats_out: dict | None = None) -> int:
    """Retrain the frozen blocks over the FULL stored live corpus,
    re-assign every vector, and RE-EMIT the pair set within the new
    cells — the cure for blocks frozen on an unrepresentative backfill
    (near-dups split across cells are invisible; check_embdedup_health
    measures exactly that). One atomic base rewrite under OCC (a racing
    sync aborts the publish — the index can never straddle two
    quantizers); cursors carry forward. Within-cell pair re-emission is
    Σ|cell|² — the rebuild price, same class as the batch operator.

    `init="sample"` (round 10): Forgy spread seeding + scaled
    iterations are the occupancy policy's cure for a COLLAPSED
    quantizer (SCALING §18.5: modulo-init centroids are k near-copies
    of the global mean; the catch-all cell they produce makes a
    mean-targeted resize useless). `stats_out` receives the
    POST-rebuild occupancy (mean/max/balance/cells_used) so a rebuild
    that did not cure the skew is visible immediately. Returns rows in
    the rebuilt index."""
    k = spec.n_cells if n_cells is None else n_cells
    iters = spec.iterations if iterations is None else iterations
    thresh = spec.threshold if threshold is None else threshold
    if not 1 <= k <= 65536:
        raise ValueError("n_cells must be 1..65536")
    _caches: list[DataFrame] = []

    def _retrain(df: DataFrame):
        if "vec_id" not in df.columns or "v" not in df.columns:
            raise ValueError(
                f"rebuild_embdedup: index {spec.name!r} has no stored "
                "vectors")
        from zync_spark.streaming.tombstones import fold_tombstones

        df = fold_tombstones(df)
        # persist: the fold's masking windows are expensive lineage, and
        # the retrain reads vecs several times (each k-means round's
        # centroid job, the reassignment, the within-cell pair
        # re-emission's self-join, and the rewrite's count+write) — one
        # materialization, explicitly unpersisted after the compact
        # returns (round-9 ADVICE: ContextCleaner-only reclamation let
        # repeated auto-rebuilds accumulate cached fold lineage)
        # ensure_compute_splits (round 11): the compact's packed read
        # coalesces for IO, so the FULL corpus can arrive in fewer
        # partitions than cores — and every retrain phase downstream
        # (k x dim assignment, within-cell pair scoring) is exactly the
        # O(cost-per-row) compute the under-split guard exists for
        vecs = ensure_compute_splits(
            df.filter(_is_vec(spec))
            .select("kafka", "vec_id", "v", "vn")).persist()
        _caches.append(vecs)
        import time as _time

        _t0 = _time.perf_counter()
        cents = S.kmeans_centroids(vecs, k=k, iterations=iters,
                                   id_col="vec_id", vec_col="v", init=init)
        if stats_out is not None:
            # the retrain phase ends here; everything after (assignment,
            # pair re-emission, clustered write) materializes inside the
            # compact and lands in the caller's wall time
            stats_out["sec_kmeans"] = round(_time.perf_counter() - _t0, 1)
        if not cents:
            raise ValueError(
                f"rebuild_embdedup: index {spec.name!r} has no stored "
                "vectors")
        # fence (the §18.1 pattern): `assigned` feeds new_vecs AND
        # both sides of the pair self-join — without a cache the full
        # O(corpus x k x dim) assignment re-evaluates THREE times
        # inside the rewrite's materialization
        assigned = _rebuild_assign(vecs, cents).persist()
        _caches.append(assigned)
        # materialize the cached assignment HERE (round-11 ask #2 phase
        # stamp, now unconditional): the count is the same job compact's
        # materialization would run first anyway, later readers hit the
        # cache — and the corpus size feeds the pair kernel's workload
        # gate (a rebuild to a SMALL k over a fat corpus is the same
        # Sigma|cell|^2 trap the sync's backfill hit)
        _t1 = _time.perf_counter()
        n_assigned = assigned.count()
        if stats_out is not None:
            stats_out["n_assigned"] = n_assigned
            stats_out["sec_assign"] = round(_time.perf_counter() - _t1, 1)
        new_vecs = assigned.select(
            "kafka",
            F.lit("vec").alias("zed_type"),
            _cell_ckey(F.col("__cell")).alias("ckey"),
            "vec_id", "v", "vn",
            F.col("__cell").alias("cell"),
        )
        # within-cell pair re-emission (Σ|cell|² — the rebuild price):
        # threshold-filtered; past the kernel gate the grouped numpy
        # scorer replaces the expression self-join (round 11 —
        # _emit_pairs; at rebuild-scale k this was the dominant
        # remaining phase once assignment went Arrow)
        pairs = _emit_pairs(
            assigned.select("vec_id", F.col("__cell").alias("cell"),
                            "v", "vn"),
            None, len(cents[0][1]), thresh, k=len(cents),
            est_rows=n_assigned)
        # fence (unconditional since round 11): the surviving >= thresh
        # set is cached — small by the threshold's design — so Σ|cell|²
        # scoring runs ONCE and the rewrite reads the cache (without
        # stats the rewrite's multiple readers re-scored every pair)
        pairs = pairs.persist()
        _caches.append(pairs)
        if stats_out is not None:
            # phase stamp: the within-cell pair scoring materializes here
            _t2 = _time.perf_counter()
            stats_out["n_pairs"] = pairs.count()
            stats_out["sec_pairs"] = round(_time.perf_counter() - _t2, 1)
        pair_rows = pairs.select(
            # fresh labels on the reserved partition -2 (rebuild): the
            # base manifest is the only commit at its seq
            F.struct(
                F.lit(spec.topic).alias("topic"),
                F.lit(-2).cast("long").alias("partition"),
                F.monotonically_increasing_id().alias("offset"),
            ).alias("kafka"),
            F.lit("duppair").alias("zed_type"),
            pmod_ckey("p:", F.col("id_a"), spec.prefix_len).alias("ckey"),
            "cell", "id_a", "id_b", "cos",
        )
        cent_rows = df.sparkSession.createDataFrame(
            [(cid, vec) for cid, vec in cents], "cid long, cv array<double>")
        cent_rows = cent_rows.select(
            F.struct(
                F.lit(spec.topic).alias("topic"),
                F.lit(-2).cast("long").alias("partition"),
                F.monotonically_increasing_id().alias("offset"),
            ).alias("kafka"),
            F.lit("centroid").alias("zed_type"),
            F.lit("c:").alias("ckey"),
            "cid", "cv",
        )
        # old pairs/centroids of THIS index are superseded by the
        # re-emission; everything of other co-tenant topics passes through
        others = df.filter(~_is_vec(spec) & ~_is_centroid(spec)
                           & ~_is_pair(spec))
        return (cent_rows
                .unionByName(new_vecs, allowMissingColumns=True)
                .unionByName(pair_rows, allowMissingColumns=True)
                .unionByName(others, allowMissingColumns=True))

    import time as _wtime

    _t_all = _wtime.perf_counter()
    try:
        n = dest.compact(target_rows=target_rows, message=message,
                         transform=_retrain, cluster_by=["ckey"])
    finally:
        # compact's count() fully materializes its own cache of the
        # transformed rows, so the retrain cache is dead once compact
        # returns — drop it instead of waiting for plan GC (round-9
        # ADVICE)
        for c in _caches:
            c.unpersist()
    if stats_out is not None:
        # sec_rewrite = everything the stamped phases don't cover:
        # the pass-through/union plan build, compact's count of the
        # transformed cache, and the 8+-file range-clustered write
        # (round-11 ask #2 — the previously unstamped remainder)
        total = _wtime.perf_counter() - _t_all
        stats_out["sec_rebuild_total"] = round(total, 1)
        stats_out["sec_rewrite"] = round(
            total - sum(stats_out.get(k) or 0.0
                        for k in ("sec_kmeans", "sec_assign",
                                  "sec_pairs")), 1)
        from zync_spark.streaming.ann_index import _occupancy_report

        _occupancy_report(dest, spec, stats_out)
    return n


def pairs_view(dest: Pool, spec: EmbDedupIndexSpec,
               ids: list[int] | None = None,
               stats_out: dict | None = None) -> DataFrame | None:
    """Near-duplicate pairs discovered so far: (cell, id_a, id_b, cos),
    tombstone-masked on BOTH members. `ids` bounds the read to the
    canonical smaller member's 'p:' buckets (point-set file skipping,
    the dedup family's contract verbatim); None returns the full view."""
    _check_plen(dest, spec)
    if ids is None:
        df = dest.scan()
    else:
        buckets = sorted({
            "p:%0*x" % (spec.prefix_len, i % (16 ** spec.prefix_len))
            for i in ids
        })
        if stats_out is not None:
            stats_out["live_files"] = len(dest.committed_files())
            stats_out["probe_files"] = len(
                dest.committed_files(bounds={"ckey": buckets}))
        df = dest.scan(bounds={"ckey": buckets})
    if df is None or "zed_type" not in df.columns:
        return None
    if "id_a" not in df.columns:
        return df.sparkSession.createDataFrame(
            [], "cell long, id_a long, id_b long, cos double")
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    tombs = read_tombs(dest, spec.topic)
    out = mask_rows(mask_rows(df.filter(_is_pair(spec)), tombs, "id_a"),
                    tombs, "id_b").select("cell", "id_a", "id_b", "cos")
    if ids is not None:
        out = out.filter(F.col("id_a").isin([int(i) for i in ids]))
    return out


def load_embdedup_spec(path: str) -> tuple[EmbDedupIndexSpec, dict]:
    """Parse an embdedup-index spec YAML; returns (spec, raw_doc).

    Spec YAML (kind REQUIRED — the `vec` field alone would dispatch to
    the ANN loader):
      kind: embdedup
      name: neardup
      source: src_pool
      dest: index_pool
      topics: [embeddings]
      id: value.vec_id
      vec: value.embedding
      n_cells: 16       # optional
      iterations: 2     # optional
      threshold: 0.45   # optional: within-cell cosine floor
      min_train: 256    # optional: defer training below this
      prefix_len: 2     # optional: pair/tomb bucket fan-out
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if doc.get("kind") != "embdedup":
        raise ValueError(
            f"{path}: kind={doc.get('kind')!r} is not an embdedup-index "
            "spec (use the matching subcommand / spec loader)")
    mt = doc.get("min_train")
    spec = EmbDedupIndexSpec(
        doc["name"],
        id_expr=doc["id"],
        vec_expr=doc["vec"],
        n_cells=int(doc.get("n_cells", 16)),
        iterations=int(doc.get("iterations", 2)),
        threshold=float(doc.get("threshold", 0.45)),
        min_train=int(mt) if mt is not None else None,
        prefix_len=int(doc.get("prefix_len", _PREFIX_LEN)),
        attrs=doc.get("attrs"),
    )
    return spec, doc


def attr_ids(dest: Pool, spec: EmbDedupIndexSpec, predicate: str):
    """Resolve a metadata filter from the embdedup index pool alone —
    wrapper over the shared implementation (streaming/attrs.py); the
    coverage guard enumerates live vectors from the 'l:' cell space.
    Semantics documented on attrs.attr_ids."""
    from zync_spark.streaming import attrs as A
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    live = None
    full = dest.scan(bounds={"ckey": ("l:", "l:g")})
    if full is not None and "vec_id" in full.columns:
        live = mask_rows(full.filter(_is_vec(spec)),
                         read_tombs(dest, spec.topic),
                         "vec_id").select("vec_id")
    return A.attr_ids(dest, spec, predicate, live_ids=live)
