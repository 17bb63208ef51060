"""Incrementally maintained IVF ANN index over an embeddings pool.

The batch operator (`functions.similarity.ivf_ann_topk`) re-trains the
coarse quantizer and re-assigns the WHOLE corpus on every call —
O(corpus) per query batch. A serving pipeline ingesting embeddings
continuously wants the index formulation:

- the coarse quantizer (fixed-point k-means centroids,
  similarity.kmeans_centroids — bit-identical on every engine) is
  trained ONCE, on the first sync's delta (the initial backfill), and
  stored in the pool as `centroid` rows. It is FROZEN thereafter — the
  standard IVF contract (FAISS-style): retraining would re-shard every
  stored list; rebuild the index to retrain.
- each maintenance pass assigns only the DELTA's vectors to their
  nearest cell (map-side against the broadcast centroids — the corpus
  never shuffles) and appends `vec` rows bucketed by cell
  (ckey = 'l:<cell hex>'), committing atomically with advanced cursors
  (`Pool.load(cursors=, occ_token=)`) — crash-safe, rerun = no-op,
  exactly the dedup-index durability argument.
- `compact_ann` range-clusters the pool by ckey; `ann_query` then
  assigns the query batch to its `nprobe` nearest cells and reads ONLY
  those cells' files (`scan(bounds=)` point-set skipping + parquet
  row-group pruning) — a query over a 100 TB index touches
  nprobe/n_cells of it, the inverted-file contract made literal in
  storage.

Because assignment depends only on (vector, frozen centroids), the
incrementally built index answers queries IDENTICALLY to a batch IVF
over the full corpus with the same centroids — differential-tested, and
hash-checked against a DuckDB oracle that replays the fixed-point
training on the backfill slice. Reference parity: the reference has no
ANN surface (beyond-reference); commit/cursor machinery mirrors its
done-marker design (README.md:447-455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.functions.compute import ensure_compute_splits
from zync_spark.functions import similarity as S
from zync_spark.pool import Pool
from zync_spark.streaming.dedup_index import _envelope, _stamp
from zync_spark.streaming.incremental import _spec_cursors, scan_delta


def _cell_ckey(cell) -> F.Column:
    """Cluster key of a vec row: 'l:' + 4-hex-char cell id (65k cells max
    — far above any sane n_cells; fixed width keeps lexicographic order
    = numeric order for file-range stats)."""
    return F.concat(F.lit("l:"), F.lower(F.lpad(F.hex(cell), 4, "0")))


class AnnIndexSpec:
    """Declarative index definition. `id_expr`/`vec_expr`: SQL
    expressions over the source pool's rows producing the vector id
    (long) and the embedding (array). n_cells/iterations mirror
    similarity.ivf_ann_topk's coarse quantizer."""

    def __init__(self, name: str, id_expr: str, vec_expr: str,
                 n_cells: int = 16, iterations: int = 2,
                 min_train: int | None = None,
                 attrs: dict[str, str] | None = None):
        if not 1 <= n_cells <= 65536:
            # _cell_ckey's fixed 4-hex-char bucket would silently
            # TRUNCATE larger cell ids (lpad truncates), making those
            # cells' vectors invisible to queries — enforce the limit
            # the label format implies
            raise ValueError("n_cells must be 1..65536")
        self.name = name
        self.topic = f"annindex:{name}"
        self.id_expr = id_expr
        self.vec_expr = vec_expr
        self.n_cells = n_cells
        self.iterations = iterations
        # metadata co-location (round 8, shared surface — see
        # streaming/attrs.py): {attr name: SQL expr over source rows};
        # sync stores index-resident 'a:' attr rows so an ANN-ONLY
        # deployment resolves `retrieve --where` without a source scan
        self.attrs = dict(attrs) if attrs else {}
        # Training-set floor: the quantizer trains ONCE, on the first
        # sync's delta — wired through FromKafka(indexes=) that is the
        # first MICRO-BATCH, which can be a handful of rows, freezing a
        # degenerate quantizer for the index's life. With min_train set,
        # sync_ann DEFERS training (commits nothing, leaves cursors
        # unmoved — the delta keeps accreting) until a pass sees at
        # least that many vectors. None keeps the old behavior but
        # warns below the FAISS-style heuristic floor (~8/cell).
        self.min_train = min_train

    # duck-types RollupSpec for _spec_cursors' key namespace
    @property
    def keys(self):  # pragma: no cover - structural only
        return {"vec_id": self.id_expr}


def _is_vec(spec: AnnIndexSpec):
    return (F.col("zed_type").eqNullSafe("vec")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def _is_centroid(spec: AnnIndexSpec):
    return (F.col("zed_type").eqNullSafe("centroid")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def stored_centroids(dest: Pool,
                     spec: AnnIndexSpec) -> list[tuple[int, list[float]]] | None:
    """The frozen coarse quantizer, or None before the first sync.
    Centroid rows live in the single 'c:' bucket — a clustered pool
    serves this from one file ('c:' sorts before every 'l:'); the
    collect is n_cells x dim doubles (KBs)."""
    df = dest.scan(bounds={"ckey": ["c:"]})
    if df is None or "cid" not in df.columns:
        return None
    rows = df.filter(_is_centroid(spec)).select("cid", "cv").collect()
    if not rows:
        return None
    return [(int(r["cid"]), [float(x) for x in r["cv"]])
            for r in sorted(rows, key=lambda r: r["cid"])]


def sync_ann(src: Pool, dest: Pool, spec: AnnIndexSpec,
             topics: list[str], message: str | None = None,
             auto_compact_every: int | None = None,
             upsert: bool = False) -> int:
    """One incremental maintenance pass. The FIRST pass trains the
    quantizer on its delta (the backfill) and commits centroid rows;
    every pass assigns its delta map-side against the frozen centroids
    and appends cell-bucketed vec rows. Returns rows appended (0 = no
    new vectors; reruns are no-ops). `auto_compact_every`: re-cluster
    (compact_ann) after that many delta commits since the last base, so
    ann_query's cell-bounded reads keep biting (un-compacted commits
    are always read); single-writer maintenance only.

    `upsert=True` (one-call CDC): every delta vec_id's previous versions
    are tombstoned in the SAME commit (re-published embeddings replace,
    not accumulate — the new vector re-assigns against the frozen
    centroids map-side); within-batch duplicates collapse to the latest
    offset first. Costs one delta-sized keyed shuffle + tombstone rows."""
    n = _sync_ann_once(src, dest, spec, topics, message, upsert=upsert)
    if (n and auto_compact_every
            and dest.commits_since_base() >= auto_compact_every):
        compact_ann(dest)
    return n


def _sync_ann_once(src: Pool, dest: Pool, spec: AnnIndexSpec,
                   topics: list[str], message: str | None,
                   upsert: bool = False) -> int:
    snapshot = len(dest.commits())
    cursors = _spec_cursors(spec, dest.stored_cursors(), topics)
    delta = scan_delta(src, cursors, topics)
    if delta is None:
        return 0
    delta = delta.persist()
    assigned = None
    try:
        new_cursors = {
            f"{spec.topic}|{r['t']}#{int(r['p'])}": int(r["mx"]) + 1
            for r in delta.groupBy(
                F.col("kafka.topic").alias("t"),
                F.col("kafka.partition").alias("p"),
            ).agg(F.max(F.col("kafka.offset")).alias("mx")).collect()
        }
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
                # defer: no commit, cursors unmoved — the next pass
                # re-scans a LARGER delta (this one plus newer rows)
                # and trains when the floor is met
                import warnings

                warnings.warn(
                    f"ann index {spec.name!r}: deferring quantizer "
                    f"training ({n_vecs} < min_train={spec.min_train} "
                    "vectors in the first delta)", stacklevel=2)
                return 0
            if 0 < n_vecs < spec.n_cells * 8:
                import warnings

                warnings.warn(
                    f"ann index {spec.name!r}: training the FROZEN "
                    f"quantizer on only {n_vecs} vectors for "
                    f"{spec.n_cells} cells (< 8/cell) — consider "
                    "min_train, or rebuild_ann once the corpus grows",
                    stacklevel=2)
            # spread the TRAINING input (round 11 — the embdedup sync's
            # single-task backfill-training finding, see its comment):
            # first pass only, the Lloyd rounds are O(rows x k x dim)
            cents = S.kmeans_centroids(
                ensure_compute_splits(vecs), k=spec.n_cells,
                iterations=spec.iterations,
                id_col="vec_id", vec_col="v")
            if cents:
                cent_rows = delta.sparkSession.createDataFrame(
                    [(cid, vec) for cid, vec in cents],
                    "cid long, cv array<double>")
        out = None
        if cents:
            # spread before assignment — same single-task finding as the
            # embdedup sync (see its comment; packed reads land small
            # deltas in one partition, assignment is k x dim per row)
            inp = ensure_compute_splits(
                vecs.select("vec_id", "v",
                            S.norm_expr(F.col("v")).alias("vn")))
            # Arrow-gated assignment (round 11, see embdedup sync).
            # Fenced (round 11, the embdedup-sync finding): the commit's
            # load pays TWO materializations (its count job, then the
            # write), and the k x dim-per-row assignment is this DAG's
            # dominant compute — uncached it ran twice.
            assigned = S.ivf_assign_fast(inp, cents, "v").persist()
            vec_rows = assigned.select(
                "vec_id", "v", "vn", F.col("__cell").alias("cell"))
            out = _stamp("vec", _cell_ckey(F.col("cell")), vec_rows)
            if cent_rows is not None:
                out = _stamp("centroid", F.lit("c:"), cent_rows).unionByName(
                    out, allowMissingColumns=True)
        if spec.attrs:
            # index-resident metadata in the shared 'a:' key space
            # (streaming/attrs.py): an ANN-only deployment then resolves
            # `retrieve --where` from this pool alone. Derived from
            # src_rows, not the non-null `vecs` subset (attrs for a
            # null-vector doc are harmless; a co-tenant family may
            # still index it). Attached even when NOTHING trained
            # (out is None — e.g. an all-null-vector bootstrap delta):
            # the cursor advance below is permanent, so skipping attrs
            # here would silently exclude those docs from every later
            # attr-filtered retrieval (round-8 ADVICE).
            from zync_spark.streaming.attrs import attr_rows

            arows = attr_rows(spec, src_rows)
            out = (arows if out is None else
                   out.unionByName(arows, allowMissingColumns=True))
        if tombs_new is not None:
            from zync_spark.streaming.tombstones import tomb_rows

            trows = tomb_rows(delta.sparkSession, tombs_new,
                              upto=snapshot, prefix_len=2)
            out = (trows if out is None else
                   out.unionByName(trows, allowMissingColumns=True))
        n = 0
        if out is not None:
            # ckey-clustered commit: cell buckets land in separate files
            # with recorded [min,max], so ann_query's bounded probe skips
            # this commit's non-probed cells immediately (no compaction
            # needed for fresh data to be boundedly readable)
            n = dest.load(_envelope(spec, out, snapshot),
                          message or f"{spec.topic} sync",
                          cursors=new_cursors, occ_token=snapshot,
                          cluster_by=["ckey"])
        if n == 0:
            # nothing indexable in the delta: advance the cursor via a
            # tombstone (same rationale as the dedup index)
            tomb = delta.sparkSession.createDataFrame(
                [((spec.topic, 0, 0), "cursors")],
                "kafka struct<topic:string,partition:long,offset:long>,"
                " zed_type string",
            )
            return dest.load(tomb, message or f"{spec.topic} sync",
                             cursors=new_cursors, occ_token=snapshot)
        return n
    finally:
        delta.unpersist()
        if assigned is not None:
            assigned.unpersist()


def _rebuild_assign(vecs: DataFrame, cents) -> DataFrame:
    """Full-corpus nprobe=1 reassignment for the REBUILD paths (round
    11): same values as `S.ivf_assign(vecs, cents, "v", nprobe=1)`, but
    routed through `S.ivf_assign_fast`, whose Arrow kernel needs a FLAT
    schema — the kafka label struct is flattened around the assignment
    and rebuilt after (values untouched). Shared by rebuild_ann and
    rebuild_embdedup; at rebuild-scale k the interpreted expression
    path was the rebuild's dominant cost (mem-cert: 64.5 s assignment
    vs 21.7 s for nine Arrow Lloyd rounds, VERDICT r10 ask #2)."""
    flat = vecs.select(
        F.col("kafka.topic").alias("__kt"),
        F.col("kafka.partition").alias("__kp"),
        F.col("kafka.offset").alias("__ko"),
        "vec_id", "v", "vn")
    assigned = S.ivf_assign_fast(flat, cents, "v")
    return assigned.select(
        F.struct(F.col("__kt").alias("topic"),
                 F.col("__kp").alias("partition"),
                 F.col("__ko").alias("offset")).alias("kafka"),
        "vec_id", "v", "vn", "__cell")


def tombstone_ann(dest: Pool, spec: AnnIndexSpec, ids) -> int:
    """Delete vectors from the index's LATEST state — O(1 commit), no
    read of the stored cells at all: a tombstone row per id (zed_type
    'tomb', ckey 'x:<pmod(id)>', upto = this pass's commit seq) masks
    every vec row committed before it; ann_query/ann_exact_topk apply
    the mask, compact_ann/rebuild_ann fold it physically. Tombstoning
    an id the index never stored is harmless (masks nothing) — so no
    presence probe is needed, which is what keeps this O(deletes) when
    vec rows are bucketed by CELL, not id.

    UPDATE flow (CDC): tombstone FIRST, then publish the new embedding
    to the source and sync_ann — the tombstone masks everything
    committed before it, so a too-early re-ingest would be masked too.
    Returns rows committed."""
    from zync_spark.streaming.tombstones import (commit_with_retry,
                                                 tomb_rows)

    def build(seq: int) -> DataFrame:
        rows = tomb_rows(dest.spark, ids, upto=seq, prefix_len=2)
        return _envelope(spec, rows, seq)

    return commit_with_retry(dest, build, f"{spec.topic} tombstone")


def _occupancy_report(dest: Pool, spec, stats_out: dict) -> None:
    """Post-rebuild cell-occupancy report (round 10): one bounded
    groupBy over the fresh base's 'l:' space — so a rebuild that did
    NOT cure the skew (quantizer geometry the data caps) is visible
    immediately in the caller's stats instead of surfacing a full
    health cadence later. The rebuild folded tombstones, so no masking
    is needed; the scan is the cell space only."""
    df = dest.scan(bounds={"ckey": ("l:", "l:g")})
    if df is None or "cell" not in df.columns:
        return
    occ = (df.filter(_is_vec(spec)).groupBy("cell")
           .agg(F.count("*").alias("n"))
           .agg(F.max("n").alias("mx"), F.avg("n").alias("av"),
                F.count("*").alias("nc")).collect()[0])
    mean_occ = float(occ["av"] or 0.0)
    stats_out["cells_used"] = int(occ["nc"] or 0)
    stats_out["max_cell_occupancy"] = int(occ["mx"] or 0)
    stats_out["mean_cell_occupancy"] = round(mean_occ, 1)
    stats_out["cell_balance"] = round(
        (float(occ["mx"] or 0) / mean_occ) if mean_occ else 1.0, 2)


def rebuild_ann(dest: Pool, spec: AnnIndexSpec,
                n_cells: int | None = None, iterations: int | None = None,
                target_rows: int = 4_000_000,
                message: str = "annindex rebuild",
                init: str = "modulo",
                stats_out: dict | None = None) -> int:
    """Retrain the frozen quantizer over the FULL stored corpus and
    re-shard every vec row against the new centroids — the module
    contract's rebuild path ("rebuild the index to retrain", module
    docstring): the cure for a quantizer frozen on an unrepresentative
    first delta, and the standard response to corpus drift degrading
    recall (FAISS retrain posture).

    Runs as ONE atomic operation: Pool.compact's transform hook drops
    the old centroid rows, trains fixed-point k-means on every stored
    vector (deterministic — same recipe as the initial sync), reassigns
    each vec row map-side (broadcast centroids, the corpus never
    shuffles), and the rewrite publishes as a ckey-clustered base
    manifest under the usual OCC claim — a concurrent sync makes the
    publish abort with ConcurrentWriteError rather than ever splitting
    the index across two quantizers. Cursors carry forward, so
    maintenance resumes where it left off; later sync_ann passes assign
    against the NEW stored centroids automatically.

    `n_cells`/`iterations` default to the spec's; pass a larger n_cells
    to re-shard a grown corpus at finer granularity (ann_query reads the
    stored centroids, so queries adapt with no spec change). `init`:
    k-means seeding — "sample" (Forgy spread, similarity._kmeans_seed_rows)
    is the occupancy policy's cure for a collapsed quantizer (round 10);
    the default keeps the historical modulo recipe. `stats_out` receives
    the POST-rebuild cell occupancy (mean/max/balance/cells_used) so a
    rebuild that could not cure a skew is visible immediately. Returns
    the rows in the rebuilt index."""
    k = spec.n_cells if n_cells is None else n_cells
    iters = spec.iterations if iterations is None else iterations
    if not 1 <= k <= 65536:
        raise ValueError("n_cells must be 1..65536")  # _cell_ckey width
    _caches: list[DataFrame] = []

    def _retrain(df: DataFrame):
        if "vec_id" not in df.columns or "v" not in df.columns:
            raise ValueError(
                f"rebuild_ann: index {spec.name!r} has no stored vectors")
        # fold tombstones FIRST: deleted vectors must not train the new
        # quantizer or re-shard into the rebuilt cells
        from zync_spark.streaming.tombstones import fold_tombstones

        df = fold_tombstones(df)
        # persist: the fold's masking windows are expensive lineage, and
        # the retrain reads vecs several times (each k-means round's
        # centroid job, the reassignment scan, and the rewrite's
        # count+write) — one materialization, explicitly unpersisted
        # after the compact returns (round-9 ADVICE: relying on
        # ContextCleaner let repeated auto-rebuilds accumulate cached
        # fold lineage in a long-lived maintenance driver)
        # ensure_compute_splits (round 11): the compact's packed read
        # coalesces for IO — the full-corpus k x dim reassignment must
        # not run on fewer partitions than cores (same guard as the
        # sync path and the embdedup rebuild)
        vecs = ensure_compute_splits(
            df.filter(_is_vec(spec))
            .select("kafka", "vec_id", "v", "vn")).persist()
        _caches.append(vecs)
        cents = S.kmeans_centroids(vecs, k=k, iterations=iters,
                                   id_col="vec_id", vec_col="v", init=init)
        if not cents:
            raise ValueError(
                f"rebuild_ann: index {spec.name!r} has no stored vectors")
        # the O(corpus x k x dim) assignment is the rewrite's heaviest
        # map; cache it alongside vecs so no later consumer (compact's
        # count/write, future co-tenant edits) can re-evaluate it
        # (round 10, the §18.1 fence discipline)
        assigned = _rebuild_assign(vecs, cents).persist()
        _caches.append(assigned)
        new_vecs = assigned.select(
            "kafka",
            F.lit("vec").alias("zed_type"),
            _cell_ckey(F.col("__cell")).alias("ckey"),
            "vec_id", "v", "vn",
            F.col("__cell").alias("cell"),
        )
        cent_rows = df.sparkSession.createDataFrame(
            [(cid, vec) for cid, vec in cents], "cid long, cv array<double>")
        cent_rows = cent_rows.select(
            # fresh labels on the reserved partition -2 (rebuild): the
            # base manifest is the only commit at its seq, so labels
            # cannot collide with any sync pass's partition>=0 rows
            F.struct(
                F.lit(spec.topic).alias("topic"),
                F.lit(-2).cast("long").alias("partition"),
                F.monotonically_increasing_id().alias("offset"),
            ).alias("kafka"),
            F.lit("centroid").alias("zed_type"),
            F.lit("c:").alias("ckey"),
            "cid", "cv",
        )
        # everything that is neither a vec nor a centroid of THIS index
        # (cursor tombstones, other indexes sharing the pool) passes
        # through untouched
        others = df.filter(~_is_vec(spec) & ~_is_centroid(spec))
        return (cent_rows
                .unionByName(new_vecs, allowMissingColumns=True)
                .unionByName(others, allowMissingColumns=True))

    try:
        n = dest.compact(target_rows=target_rows, message=message,
                         transform=_retrain, cluster_by=["ckey"])
    finally:
        # compact's own MEMORY_AND_DISK cache of the transformed rows is
        # fully materialized by its count(), so the retrain cache is
        # dead the moment compact returns — drop it instead of waiting
        # for plan GC (round-9 ADVICE)
        for c in _caches:
            c.unpersist()
    if stats_out is not None:
        _occupancy_report(dest, spec, stats_out)
    return n


def compact_ann(dest: Pool, target_rows: int = 4_000_000,
                message: str = "annindex compact") -> int:
    """Range-cluster the index pool by ckey so each output file covers a
    narrow cell range (per-file [min,max] in the manifest) — ann_query's
    bounded probe then skips non-probed cells at FILE granularity. Until
    it runs, fresh commits carry no stats and are simply always read.
    Tombstones FOLD here: masked vec rows and the tombstone rows leave
    together in the base rewrite (streaming.tombstones.fold_tombstones)."""
    from zync_spark.streaming.tombstones import fold_tombstones

    return dest.compact(target_rows=target_rows, message=message,
                        transform=fold_tombstones, cluster_by=["ckey"])


def ann_exact_topk(dest: Pool, spec: AnnIndexSpec, queries: DataFrame,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   k: int = 10,
                   where_ids: DataFrame | None = None) -> DataFrame:
    """Exact brute-force cosine top-k over the STORED corpus — the
    ground truth ann_recall measures against. Split out so a
    recall-vs-nprobe sweep computes it ONCE and passes it to each
    ann_recall call via `exact=` (it is nprobe-independent and the
    dominant cost of the measurement — round-5 review). `where_ids`
    restricts the corpus — the exact side of the recall-under-filter
    measurement."""
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    stored = dest.scan()
    if stored is None or "vec_id" not in stored.columns:
        raise ValueError(f"ann_recall: index {spec.name!r} is empty")
    corpus = mask_rows(stored.filter(_is_vec(spec)),
                       read_tombs(dest, spec.topic), "vec_id").select(
        "vec_id", F.col("v").alias("emb"))
    if where_ids is not None:
        from zync_spark.streaming.tombstones import allowed_ids

        corpus = corpus.join(allowed_ids(where_ids, "vec_id"),
                             "vec_id", "left_semi")
    q = queries.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("emb"))
    cents = stored_centroids(dest, spec)
    return S.cosine_topk(corpus, q, "vec_id", "emb", k=k,
                         dim=len(cents[0][1]) if cents else None)


def ann_recall(dest: Pool, spec: AnnIndexSpec, queries: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               k: int = 10, nprobe: int = 2,
               exact: DataFrame | None = None) -> DataFrame:
    """Retrieval QUALITY of the stored index: per-query recall@k of
    ann_query against exact brute-force cosine top-k over the SAME
    stored corpus — (query_id, recall) with recall in [0,1]. This is
    the measurement every current hash gate misses (they pin
    determinism, not whether the neighbors are any good): an index
    frozen on a bad quantizer scores low here and rebuild_ann is the
    fix. Deterministic — both sides break cosine ties by neighbor_id —
    so it can ride the catalog's hash compare as a bounded-error entry
    (ann_recall_at10). Cost: the exact side is one broadcast-join scan
    of the stored vectors (a MEASUREMENT pass, not a serving path) —
    sweeping nprobe? compute it once with ann_exact_topk and pass
    `exact=`."""
    if exact is None:
        exact = ann_exact_topk(dest, spec, queries, id_col=id_col,
                               vec_col=vec_col, k=k)
    approx = ann_query(dest, spec, queries, id_col=id_col, vec_col=vec_col,
                       k=k, nprobe=nprobe)
    n_exact = exact.groupBy("query_id").agg(
        F.count("*").alias("__n"))  # < k when the corpus is small
    hits = (approx.select("query_id", "neighbor_id")
            .join(exact.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count("*").alias("__h")))
    return (n_exact.join(hits, "query_id", "left")
            .select("query_id",
                    (F.coalesce(F.col("__h"), F.lit(0)) / F.col("__n"))
                    .alias("recall")))


def load_ann_spec(path: str) -> tuple[AnnIndexSpec, dict]:
    """Parse an ann-index spec YAML (the CLI's format); returns
    (spec, raw_doc) — the doc carries routing fields (source/dest/topics)
    the caller resolves to pools.

    Spec YAML:
      name: emb
      source: src_pool
      dest: index_pool
      topics: [embeddings]
      id: value.vec_id
      vec: value.embedding
      n_cells: 16       # optional
      iterations: 2     # optional
      min_train: 256    # optional: defer training below this many vectors
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    mt = doc.get("min_train")
    spec = AnnIndexSpec(
        doc["name"],
        id_expr=doc["id"],
        vec_expr=doc["vec"],
        n_cells=int(doc.get("n_cells", 16)),
        iterations=int(doc.get("iterations", 2)),
        min_train=int(mt) if mt is not None else None,
        attrs=doc.get("attrs"),
    )
    return spec, doc


def attr_ids(dest: Pool, spec: AnnIndexSpec, predicate: str):
    """Resolve a metadata filter from the ANN index pool alone — the
    ANN-family wrapper over the shared implementation
    (streaming/attrs.py): the coverage guard enumerates live indexed
    vectors from the 'l:' cell space, so an index synced before the
    spec declared attrs fails LOUD instead of silently excluding
    pre-attrs docs. Semantics documented on attrs.attr_ids."""
    from zync_spark.streaming import attrs as A
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    live = None
    full = dest.scan(bounds={"ckey": ("l:", "l:g")})
    if full is not None and "vec_id" in full.columns:
        live = mask_rows(full.filter(_is_vec(spec)),
                         read_tombs(dest, spec.topic),
                         "vec_id").select("vec_id")
    return A.attr_ids(dest, spec, predicate, live_ids=live)


def ann_query(dest: Pool, spec: AnnIndexSpec, queries: DataFrame,
              id_col: str = "vec_id", vec_col: str = "embedding",
              k: int = 5, nprobe: int = 2,
              stats_out: dict | None = None,
              where_ids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k against the stored index: assign the query
    batch to its `nprobe` nearest cells (map-side vs the frozen
    centroids), then score ONLY those cells' stored vectors. The probed
    cell ids bound the scan (`bounds={"ckey": [...]}`): a compacted
    index serves the query from ~nprobe/n_cells of its files —
    `stats_out` receives probe_files/live_files, the boundedness
    contract under test. Output shape matches ivf_ann_topk:
    (query_id, neighbor_id, rank, cos).

    `where_ids` (filtered retrieval): a frame whose FIRST column is the
    allowed neighbor ids. The filter applies to the probed cells'
    candidates BEFORE the top-k window — so unlike fetch-then-filter
    systems there is no over-fetch factor to tune: within the probed
    cells the filtered answer is EXACT (every matching candidate was
    scored). The residual approximation is nprobe itself — matches
    living in unprobed cells are missed, the classic pre/post-filter
    recall trade — and recall-under-filter rises monotonically with
    nprobe to 1.0 at full probe (pinned by test_retrieval). The
    semi-join's big side is the filter scan (predicate pushed down);
    AQE broadcasts whichever side is small."""
    cents = stored_centroids(dest, spec)
    if cents is None:
        raise ValueError(f"ann_query: index {spec.name!r} is empty "
                         "(run sync_ann first)")
    # q is evaluated twice (the cells collect below + the broadcast
    # join): it is the SMALL side by contract — it broadcasts — so
    # re-scoring Q x n_cells cosines beats holding a cache across the
    # call boundary (the returned frame is lazy; an unpersist here would
    # drop the cache before the caller materializes).
    q = S.ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            S.norm_expr(F.col(vec_col)).alias("qn"),
        ),
        cents, "qv", nprobe=nprobe)
    cells = sorted({
        int(r["c"]) for r in
        q.select(F.col("__cell").alias("c")).distinct().collect()
    })  # <= n_cells values: a metadata collect, same class as centroids
    ckeys = ["l:%04x" % c for c in cells]
    if stats_out is not None:
        stats_out["live_files"] = len(dest.committed_files())
        stats_out["probe_files"] = len(
            dest.committed_files(bounds={"ckey": ckeys}))
    stored = dest.scan(bounds={"ckey": ckeys})
    if stored is None:
        # every probed cell's files were skipped (the probed centroids
        # own no stored vectors): the correct answer is empty, not a
        # crash — mirror the output schema
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank long, cos double")
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    cand = (
        mask_rows(stored.filter(_is_vec(spec) & F.col("ckey").isin(ckeys)),
                  read_tombs(dest, spec.topic), "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("cv"),
            F.col("vn").alias("cn"),
            F.col("cell").alias("__cell"),
        )
    )
    if where_ids is not None:
        from zync_spark.streaming.tombstones import allowed_ids

        cand = cand.join(allowed_ids(where_ids, "neighbor_id"),
                         "neighbor_id", "left_semi")
    scored = (
        cand.join(F.broadcast(q), "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            # candidate scoring in the measured-3x unrolled form — dim
            # is a property of the stored quantizer (round 10)
            (S.dot_expr_dim(F.col("qv"), F.col("cv"), len(cents[0][1]))
             / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
        # a neighbor can appear via more than one probed cell
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # two-stage exact top-k — probed cells can still be corpus-scale on
    # skewed quantizers; see similarity._topk_per_query's scale note
    from zync_spark.functions.similarity import topk_per_query

    return topk_per_query(scored, k)
