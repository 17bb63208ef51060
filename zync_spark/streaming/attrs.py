"""Index-resident metadata ("attrs") — the ONE implementation every
index family shares (round 8; round 7 built it for the text family
only, which left an ANN-only deployment resolving `retrieve --where`
through a per-query source-pool scan — the exact read co-location
exists to eliminate).

Contract (unchanged from round 7, now spec-agnostic):

- a spec declares `attrs={name: SQL expr over source rows}`; its sync
  stores ONE narrow 'attr' row per delta id in the shared 'a:' key
  space: (zed_type='attr', ckey='a:<pmod(id)>', doc_id, attrs
  map<string,string>). The id column is ALWAYS named doc_id — whatever
  the family calls its id — because `fold_tombstones` masks the 'attr'
  zed_type by doc_id pool-wide; one uniform shape is what makes the
  retention machinery family-agnostic.
- `attr_ids(dest, spec, predicate, live_ids=)` resolves a retrieval
  filter from the index pool ALONE: latest version per id wins
  (commit-seq, then offset — under the CDC contract a superseded
  version's metadata can never admit a stale doc), tombstoned ids are
  masked, and the COVERAGE guard refuses loudly when any live indexed
  id (the family-provided `live_ids` frame) has no attr row — an index
  synced before the spec declared attrs would otherwise silently
  exclude every pre-attrs doc from retrieval.
- attr rows survive family rebuilds: rebuild transforms pass
  non-family rows through untouched (ann/embdedup) or re-emit them
  explicitly (text), keeping their kafka labels so latest-wins and
  tombstone masking keep working on the rebuilt pool.

Cost: resolving a filter is one bounded 'a:' range read of
O(#indexed ids) NARROW rows + one limit-1 anti-join coverage probe —
priced like the index probes it gates, never like a corpus scan.

Reference parity: the reference has no index or retrieval surface
(beyond-reference module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming.dedup_index import _stamp, pmod_ckey

# the whole 'a:' attr key space as one range bound ('a:g' closes the
# hex alphabet) — width-independent, mirrors tombstones.TOMB_BOUNDS
ATTR_BOUNDS = ("a:", "a:g")


def _is_attr(spec):
    return (F.col("zed_type").eqNullSafe("attr")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def attr_rows(spec, src_rows: DataFrame) -> DataFrame:
    """The 'attr' rows a sync pass commits for its delta: EXACTLY one per
    id, derived from the RAW delta rows (not the family's indexable
    subset — an empty-text/null-vector doc can still live in a co-tenant
    index, and an attr filter must not silently exclude it from that
    leg). Requires spec.attrs / spec.id_expr; bucket fan-out follows the
    spec's prefix_len (families without one use the tombstone default,
    2).

    Within-pass version collapse (round-8 ADVICE): stored offsets come
    from monotonically_increasing_id, which carries NO version order —
    two same-id rows in one non-upsert delta would otherwise pick an
    arbitrary winner at read time. Collapse here by the SOURCE kafka
    coordinates instead: latest offset within the id's source partition
    wins (the per-partition sequence is the only real version order —
    keep_latest_versions' contract); an id spread across source
    partitions in one pass has no order, so the tie-break on partition
    is arbitrary-but-deterministic (upsert mode refuses that case
    loudly before this ever runs). Across passes, attr_ids' latest-wins
    window orders by stored kafka.partition = the OCC commit seq first,
    so the later pass always supersedes."""
    from pyspark.sql import Window

    pairs: list = []
    for k in sorted(spec.attrs):
        pairs += [F.lit(k), F.expr(spec.attrs[k]).cast("string")]
    plen = getattr(spec, "prefix_len", 2)
    w = Window.partitionBy(F.expr(spec.id_expr)).orderBy(
        F.col("kafka.partition").desc(), F.col("kafka.offset").desc())
    arows = (src_rows
             # null-id rows (co-tenant topics, markers) leave BEFORE the
             # window — they are not entities, and a null partition
             # would funnel them all through one task
             .filter(F.expr(spec.id_expr).isNotNull())
             .withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1)
             .select(
                 F.expr(spec.id_expr).cast("long").alias("doc_id"),
                 F.create_map(*pairs).alias("attrs"),
             ).filter(F.col("doc_id").isNotNull()))
    return _stamp("attr", pmod_ckey("a:", F.col("doc_id"), plen), arows)


def attr_ids(dest: Pool, spec, predicate: str,
             live_ids: DataFrame | None = None) -> DataFrame:
    """Resolve a metadata filter from the INDEX pool alone — the
    allowed-id frame (single column doc_id) for `predicate` over the
    spec's co-located attrs. Attr names are exposed as string columns
    (`lang = 'en'`); numeric attrs compare via cast
    (`cast(n_chars as bigint) > 100`).

    `live_ids`: the family's live indexed ids (first column, any name)
    for the coverage guard — a live id with no attr row means the index
    predates the spec's attrs and the filter would silently exclude it;
    fail loud instead (the cure is a rebuild or re-sync). Pass None
    only when the caller has no id enumeration (guard skipped).

    Raises EmptyIndexError when the spec declares no attrs or the pool
    carries no attr rows, so callers can fall back to the source-pool
    scan loudly."""
    from pyspark.sql import Window

    from zync_spark.streaming.health import EmptyIndexError
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    if not getattr(spec, "attrs", None):
        raise EmptyIndexError(
            f"index {spec.name!r}: spec declares no attrs — "
            "co-located filtering needs attrs at sync time")
    df = dest.scan(bounds={"ckey": ATTR_BOUNDS})
    if df is None or "attrs" not in df.columns:
        raise EmptyIndexError(
            f"index {spec.name!r} has no attr rows (synced before "
            "the spec declared attrs?) — rebuild or re-sync first")
    tombs = read_tombs(dest, spec.topic)
    rows = mask_rows(df.filter(_is_attr(spec)), tombs, "doc_id")
    if live_ids is not None:
        # COVERAGE guard: one bounded anti-join, limit 1 — priced like
        # the filter read it protects
        live = live_ids.select(
            F.col(live_ids.columns[0]).cast("long").alias("doc_id"))
        uncovered = (live.join(rows.select("doc_id"), "doc_id",
                               "left_anti").limit(1).collect())
        if uncovered:
            raise ValueError(
                f"index {spec.name!r}: id {uncovered[0]['doc_id']} "
                "(and possibly others) predates the spec's attrs — "
                "attr-filtered retrieval would silently exclude it; "
                "rebuild or re-sync the corpus first")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("kafka.partition").desc(), F.col("kafka.offset").desc())
    latest = (rows.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1))
    cols = [F.col("doc_id")] + [
        F.col("attrs").getItem(k).alias(k) for k in sorted(spec.attrs)]
    return latest.select(*cols).filter(F.expr(predicate)).select("doc_id")
