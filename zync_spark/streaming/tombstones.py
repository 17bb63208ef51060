"""Tombstone (update/delete) propagation for the pool-backed index
families (MinHash-LSH dedup, IVF ANN, BM25 text, ExactSubstr span).

Before round 6 every family was append-only: correcting one document
took `Pool.compact(keep_latest_by_key)` on the SOURCE plus a full
`rebuild_*` of the index — O(corpus) per correction, the one operation
a re-crawling training-data pipeline performs constantly. Tombstones
make it O(deleted docs + their buckets):

- A tombstone row `(did, upto)` is committed like any other index row —
  zed_type 'tomb', cluster key 'x:<pmod(did) hex>', the usual kafka
  envelope — in ONE atomic OCC commit. `upto` is the commit sequence
  the delete pass publishes at.
- SEQUENCE-BASED masking: every index row already carries
  kafka.partition = the commit seq of the pass that wrote it (the
  _envelope contract; migrations/rebuilds use the reserved -1/-2). A
  row is dead iff a tombstone for its id has `upto > row partition` —
  so a LATER re-insert of the same id (a CDC update: tombstone, then
  re-publish + sync) is live while every earlier version is masked.
  No read-modify-write of stored rows, ever.
- Views, searches, and sync-time probes mask (read the small 'x:'
  space — O(total live tombstones), one range bound — and left-join;
  the tombstone side is deletion-sized, so Spark broadcasts it).
- `fold_tombstones` drops masked rows AND the tombstones themselves
  during the compaction/rebuild rewrite the pool was paying anyway —
  safe because a base rewrite replaces every live file atomically, so
  a tombstone and everything it masks leave together.

The ordering contract callers must respect (documented on every
tombstone_* function): to UPDATE a document, tombstone FIRST, then
publish the new version and sync — a tombstone masks everything
committed before it, including a too-early re-ingest.

Reference parity: the reference is append-only end-to-end (its engine
has no delete surface) — this module is beyond-reference; the commit
machinery mirrors its done-marker design (README.md:447-455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming.dedup_index import pmod_ckey

# The whole 'x:' key space as one range bound ('x:g' closes the hex
# alphabet) — width-independent, so one read covers any prefix_len.
TOMB_BOUNDS = ("x:", "x:g")


def tomb_ckey(did, prefix_len: int) -> F.Column:
    """Cluster key of a tombstone row: 'x:' + pmod bucket of the doc id
    (the shared pmod_ckey definition — point lookups of one id's
    tombstones stay file-skippable; whole-space reads use TOMB_BOUNDS)."""
    return pmod_ckey("x:", did, prefix_len)


def ids_frame(spark, ids) -> DataFrame:
    """Normalize a delete set to a distinct single-column frame
    (did long). Accepts a DataFrame (first column is the id — the form
    a 100 TB pipeline produces delete sets in; the ids never pass
    through the driver) or any iterable of ints."""
    if isinstance(ids, DataFrame):
        return ids.select(
            F.col(ids.columns[0]).cast("long").alias("did")).distinct()
    vals = sorted({int(i) for i in ids})
    if not vals:
        raise ValueError("tombstone: empty id list")
    return spark.createDataFrame([(i,) for i in vals], "did long")


def allowed_ids(where_ids: DataFrame, alias: str) -> DataFrame:
    """The ONE definition of the where_ids contract every filtered-read
    consumer shares (search_text / ann_query / ann_exact_topk): the
    frame's FIRST column is the allowed id, cast to long under the
    caller's join alias. No distinct — left_semi joins are insensitive
    to right-side duplicates, and deduping a big filter scan would cost
    a shuffle for nothing (round-6 review: one definition, not three
    inlined copies of the convention)."""
    return where_ids.select(
        F.col(where_ids.columns[0]).cast("long").alias(alias))


def id_buckets(ids: DataFrame, prefix: str, prefix_len: int) -> list[str]:
    """The distinct cluster-key buckets a delete set touches — a
    <=16^prefix_len-value metadata collect (the same class as the index
    probes' prefix collects), independent of how many ids die."""
    return sorted(
        r["ck"] for r in ids.select(
            pmod_ckey(prefix, F.col("did"), prefix_len).alias("ck"))
        .distinct().collect())


def tomb_rows(spark, ids, upto: int, prefix_len: int) -> DataFrame:
    """(zed_type='tomb', ckey, did, upto) rows for `ids` (list or
    DataFrame) — the caller wraps them in its family's envelope and
    commits them atomically with whatever else the pass writes."""
    df = ids_frame(spark, ids)
    return df.select(
        F.lit("tomb").alias("zed_type"),
        tomb_ckey(F.col("did"), prefix_len).alias("ckey"),
        "did",
        F.lit(int(upto)).cast("long").alias("upto"),
    )


def read_tombs(dest: Pool, topic: str) -> DataFrame | None:
    """The live tombstone set of one index topic, reduced to
    (did, max upto) — the only form masking needs ("dead iff ANY
    tombstone is later than the row" == "max(upto) > row partition").
    One bounded 'x:' range read, O(live tombstones); None when the pool
    has never seen a delete (the common case — masking joins vanish)."""
    df = dest.scan(bounds={"ckey": TOMB_BOUNDS})
    if df is None or "upto" not in df.columns or "did" not in df.columns:
        return None
    tombs = (df.filter(F.col("zed_type").eqNullSafe("tomb")
                       & F.col("kafka.topic").eqNullSafe(topic))
             .groupBy("did").agg(F.max("upto").alias("__upto")))
    return tombs


def mask_rows(df: DataFrame, tombs: DataFrame | None, id_col: str,
              part_col: str = "kafka.partition") -> DataFrame:
    """Drop rows masked by `tombs`: keep a row iff its id has no
    tombstone or the row's commit seq is >= the latest tombstone's
    `upto` (i.e. the row was written AFTER the delete — a re-insert).
    `df` must still carry its kafka envelope (or pass part_col). The
    tombstone side is deletion-sized — AQE broadcasts it; the big side
    never shuffles."""
    if tombs is None:
        return df
    t = tombs.select(F.col("did").alias("__did"), "__upto")
    return (df.join(F.broadcast(t),
                    F.col(id_col) == F.col("__did"), "left")
            .filter(F.col("__upto").isNull()
                    | (F.expr(part_col) >= F.col("__upto")))
            .drop("__did", "__upto"))


def has_tombstones(df: DataFrame) -> bool:
    """Cheap pre-check for fold paths: does the frame carry any
    tombstone machinery at all? (Pure schema inspection — no job.)"""
    cols = set(df.columns)
    return "zed_type" in cols and "upto" in cols and "did" in cols


def fold_tombstones(df: DataFrame) -> DataFrame:
    """Compaction transform: physically drop every masked row and the
    tombstone rows themselves — for ALL index topics sharing the pool
    at once (zed_type names are globally distinct across families, so
    one fold serves any index pool). Also folds the span family's
    marker retractions: 'unhit' rows erase the 'hit' rows they mask,
    'undup' rows erase superseded 'dup' markers, then both retraction
    types are dropped. Safe ONLY inside a base rewrite (Pool.compact):
    the rewrite replaces every live file in one OCC publish, so a
    tombstone and everything it masks leave together — a partial fold
    cannot exist. Surviving rows keep their kafka labels, so later
    tombstones keep working on the folded pool."""
    if not has_tombstones(df):
        df = _fold_span_retractions(df)
        return df
    tombs = (df.filter(F.col("zed_type").eqNullSafe("tomb"))
             .groupBy(F.col("kafka.topic").alias("__t"),
                      F.col("did").alias("__did"))
             .agg(F.max("upto").alias("__upto")))

    def mask(rows: DataFrame, id_col: str) -> DataFrame:
        # masked == a tombstone of the SAME topic and id is later than
        # the row; the renamed tombs side can never collide with the
        # rows frame's own columns
        return (rows.join(
            F.broadcast(tombs),
            (F.col("kafka.topic") == F.col("__t"))
            & (F.col(id_col) == F.col("__did")), "left")
            .filter(F.col("__upto").isNull()
                    | (F.col("kafka.partition") >= F.col("__upto")))
            .drop("__t", "__did", "__upto"))

    # Partition the frame by which id column governs masking. Types with
    # no id semantics (meta, cstat, centroid, cursor tombstones, plain
    # data rows of co-tenant topics) pass through untouched.
    # null-SAFE type predicates: schema-widened rows have a null
    # zed_type, and a bare ~isin(null) is null (row silently dropped
    # from every branch — data loss); coalesce pins them to `rest`
    by_doc = ("index", "band", "post", "dlen", "win", "hit", "fwd",
              "attr")
    is_doc = (F.coalesce(F.col("zed_type").isin(*by_doc), F.lit(False))
              & F.col("doc_id").isNotNull()) if "doc_id" in df.columns \
        else F.lit(False)
    is_vec = (F.col("zed_type").eqNullSafe("vec")
              & F.col("vec_id").isNotNull()) if "vec_id" in df.columns \
        else F.lit(False)
    is_pair = (F.col("zed_type").eqNullSafe("duppair")
               & F.col("id_a").isNotNull()) if "id_a" in df.columns \
        else F.lit(False)
    is_tomb = F.col("zed_type").eqNullSafe("tomb")
    rest = df.filter(~is_doc & ~is_vec & ~is_pair & ~is_tomb)
    parts = [rest]
    if "doc_id" in df.columns:
        parts.append(_strip(mask(df.filter(is_doc), "doc_id"), df))
    if "vec_id" in df.columns:
        parts.append(_strip(mask(df.filter(is_vec), "vec_id"), df))
    if "id_a" in df.columns:
        # a pair dies when EITHER member does
        pairs = mask(df.filter(is_pair), "id_a")
        pairs = mask(pairs, "id_b")
        parts.append(_strip(pairs, df))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return _fold_span_retractions(out)


def _strip(masked: DataFrame, like: DataFrame) -> DataFrame:
    """Restore the original column set after a mask join (the tombs-side
    `did` column collides when the frame carries its own)."""
    return masked.select(*[F.col(c) for c in like.columns])


def _fold_span_retractions(df: DataFrame) -> DataFrame:
    """Fold the span family's retraction rows (no-op for other pools):
    drop 'hit' rows superseded by a later 'unhit' at the same
    (topic, doc, pos), drop 'dup' markers superseded by a later 'undup'
    for the same (topic, h), then drop the retraction rows themselves."""
    cols = set(df.columns)
    if "zed_type" not in cols:
        return df
    has_unhit_shape = {"doc_id", "pos"} <= cols
    has_undup_shape = "h" in cols
    out = df
    if has_unhit_shape:
        unhits = (out.filter(F.col("zed_type").eqNullSafe("unhit"))
                  .groupBy(F.col("kafka.topic").alias("__t"),
                           F.col("doc_id").alias("__d"),
                           F.col("pos").alias("__p"))
                  .agg(F.max("kafka.partition").alias("__u")))
        hits = out.filter(F.col("zed_type").eqNullSafe("hit"))
        live_hits = (hits.join(
            F.broadcast(unhits),
            (F.col("kafka.topic") == F.col("__t"))
            & (F.col("doc_id") == F.col("__d"))
            & (F.col("pos") == F.col("__p")), "left")
            .filter(F.col("__u").isNull()
                    | (F.col("kafka.partition") >= F.col("__u"))))
        # null-safe negation: ~isin(null) is null, which would drop
        # schema-widened null-zed_type rows — data loss
        out = (out.filter(~F.coalesce(
            F.col("zed_type").isin("hit", "unhit"), F.lit(False)))
               .unionByName(_strip(live_hits, out),
                            allowMissingColumns=True))
    if has_undup_shape:
        undups = (out.filter(F.col("zed_type").eqNullSafe("undup"))
                  .groupBy(F.col("kafka.topic").alias("__t"),
                           F.col("h").alias("__h"))
                  .agg(F.max("kafka.partition").alias("__u")))
        dups = out.filter(F.col("zed_type").eqNullSafe("dup"))
        live_dups = (dups.join(
            F.broadcast(undups),
            (F.col("kafka.topic") == F.col("__t"))
            & (F.col("h") == F.col("__h")), "left")
            .filter(F.col("__u").isNull()
                    | (F.col("kafka.partition") >= F.col("__u"))))
        out = (out.filter(~F.coalesce(
            F.col("zed_type").isin("dup", "undup"), F.lit(False)))
               .unionByName(_strip(live_dups, out),
                            allowMissingColumns=True))
    return out


def commit_with_retry(dest: Pool, build_frame, message: str,
                      attempts: int = 8) -> int:
    """OCC commit loop for label-carrying maintenance writes (the
    migrate_band_rows pattern): `build_frame(seq)` must stamp its rows
    with partition=seq so labels stay unique per commit; a lost race
    rebuilds with fresh labels and retries."""
    from zync_spark.pool import ConcurrentWriteError

    for _ in range(attempts):
        seq = len(dest.commits())
        out = build_frame(seq)
        try:
            return dest.load(out, message, occ_token=seq,
                             cluster_by=["ckey"])
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"{message}: lost the commit race repeatedly; re-run")


def keep_latest_versions(delta: DataFrame, id_expr: str) -> DataFrame:
    """Within-batch CDC collapse for upsert syncs: when one micro-batch
    carries several versions of the same id, only the LATEST (highest
    kafka.offset WITHIN the id's partition) may be indexed — the
    same-commit tombstone masks stored rows but not sibling delta rows,
    so earlier in-batch versions must leave before indexing. One
    delta-sized keyed shuffle, only paid on the upsert path.

    An id spread across PARTITIONS in one batch is refused loudly:
    offsets are per-partition sequences, so no cross-partition version
    order exists (comparing them would silently index an arbitrary —
    possibly stale — version; round-6 review). Kafka's own contract
    keys CDC topics by entity, so versions of one id share a partition;
    a topic that violates that must upsert per partition instead.
    Cross-BATCH multi-partition republish is fine — the later batch's
    same-commit tombstone masks whatever any earlier batch indexed."""
    from pyspark.sql import Window

    multi = (delta.groupBy(F.expr(id_expr).alias("__id"))
             .agg(F.count_distinct("kafka.partition").alias("__np"))
             .filter(F.col("__np") > 1).limit(1).collect())
    if multi:
        raise ValueError(
            f"upsert: id {multi[0]['__id']!r} appears in multiple "
            "partitions within one batch — offsets are per-partition "
            "sequences, so no cross-partition version order exists; "
            "key the CDC topic by id, or sync each partition separately")
    w = Window.partitionBy(F.expr(id_expr)).orderBy(
        F.col("kafka.offset").desc())
    return (delta.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def with_upserts(tombs: DataFrame | None, ids: DataFrame,
                 upto: int) -> DataFrame:
    """The masking view an upsert pass must probe stored state with: the
    pool's live tombstones PLUS this pass's delta ids at upto=snapshot —
    so the pass can never pair/count a delta row against a stored
    version it is about to supersede."""
    new = ids.select(F.col(ids.columns[0]).cast("long").alias("did"),
                     F.lit(int(upto)).cast("long").alias("__upto"))
    if tombs is None:
        return new
    return (tombs.unionByName(new)
            .groupBy("did").agg(F.max("__upto").alias("__upto")))

def fold_compact(dest: Pool, specs=(), target_rows: int = 4_000_000,
                 message: str = "pool fold-compact") -> int:
    """Family-AGNOSTIC fold compaction: one base rewrite that drops every
    masked row, tombstone, and retraction marker for ALL index families
    sharing the pool (fold_tombstones is keyed on globally-distinct
    zed_type names, so one pass serves any co-tenant mix — the
    multi-tenant contract the per-family compact_* wrappers each
    delegate to implicitly).

    `specs`: the index specs living in this pool, when known. Only the
    dedup family needs one (its legacy self-heal — band migration + ckey
    backfill — is prefix_len-dependent); two dedup specs with different
    prefix_lens in one pool would make the backfill ambiguous and are
    refused loudly. Other families' specs are accepted and ignored.

    Single-writer maintenance semantics: a concurrent load makes the
    base publish fail with ConcurrentWriteError (never data loss) — the
    maintenance loop catches it and retries next cadence."""
    plens = sorted({s.prefix_len for s in specs
                    if type(s).__name__ == "DedupIndexSpec"})
    if len(plens) > 1:
        raise ValueError(
            f"fold_compact: dedup specs with different prefix_lens "
            f"{plens} share pool {dest.path} — the legacy-row backfill "
            "is prefix_len-dependent; give each dedup index its own pool")

    def transform(df: DataFrame) -> DataFrame:
        if plens:
            from zync_spark.streaming.dedup_index import _upgrade_and_fill
            df = _upgrade_and_fill(df, plens[0])
        return fold_tombstones(df)

    return dest.compact(target_rows=target_rows, message=message,
                        transform=transform, cluster_by=["ckey"])
