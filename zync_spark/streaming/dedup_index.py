"""Incrementally maintained MinHash-LSH dedup index over a document pool.

The batch operator (`functions.dedup.minhash_lsh_pairs`) recomputes
shingle sets, signatures, and the banded self-join for the WHOLE corpus on
every run — O(corpus) per invocation. A training-data pipeline ingesting
continuously needs the incremental formulation: each maintenance pass
costs O(new documents):

- signatures/band keys are computed for the DELTA only (cursor-bounded
  scan, the same manifest-pruned resume as streaming/incremental.py);
- candidate pairs are (new x index) via a band-key join against the
  stored index plus (new x new) within the batch — a document pair is
  discovered exactly once, when its LATER member arrives, and the
  incremental pair set over any batch split is IDENTICAL to the batch
  operator's output on the full corpus (LSH banding is deterministic;
  differential-tested);
- the new index rows, the verified pairs, and the advanced cursors
  commit in ONE atomic manifest (`Pool.load(cursors=, occ_token=)`):
  a crashed pass leaves nothing and the rerun is a no-op-safe replay,
  concurrent passes race compare-and-set and exactly one commits — the
  same durability argument as rollup sync.

Bounded probe (the 100 TB posture): the index is stored in BUCKETED form.
Every row carries a cluster key `ckey` partitioning the pool into three
key spaces — `b:<xx>` exploded band rows (doc_id, bkey) bucketed by the
band key's first `prefix_len` hex chars (16^prefix_len buckets, default
256; size it to the corpus at index creation — it is fixed for the
index's life), `s:<xx>` signature rows (doc_id, sh_set, bkeys) bucketed
by pmod(doc_id, 16^prefix_len), `p:<xx>` pair rows bucketed by
pmod(id_a, ...) — every key space is file-skippable.
`compact_index()` range-clusters the pool by ckey (Pool.compact
cluster_by), recording per-file ckey min/max in the manifest, and a
maintenance pass probes with `scan(bounds={"ckey": [values...]})` — it
reads ONLY the band buckets its delta can collide with, then ONLY the
signature buckets of the colliding documents (plus not-yet-compacted
commits, which carry no file stats and are always read). Per-pass read
cost is O(delta + colliding buckets), not O(index) — the same bounded
resume the cursor machinery gives the source scan (etl/build.go:9-18 is
the reference's planned-but-unbuilt analog). Pools written before the
band-row format get a full-scan fallback; `migrate_band_rows()` upgrades
them in one commit. Reference parity: the reference has no dedup surface
at all (this module is beyond-reference); the commit/cursor machinery
mirrors its done-marker design (README.md:447-455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming.incremental import _spec_cursors, scan_delta

# Default ckey bucket fan-out: 2 hex chars = 256 buckets per key space.
# A pass reads ~min(1, delta_docs x bands / 16^prefix_len) of the band
# buckets, so the prefix length sets the floor on how little of a LARGE
# index a small delta touches: 2 (256 buckets) suits pools up to ~10^8
# docs; create TB-scale indexes with prefix_len=3 (4096 buckets) or 4.
# FIXED for the life of an index — stored ckeys and probe values must
# agree exactly (a longer probe prefix would row-filter past stored
# band buckets and silently miss collisions).
_PREFIX_LEN = 2


def _band_ckey(bkey, prefix_len: int = _PREFIX_LEN) -> F.Column:
    """Cluster key of a band row: 'b:' + first hex chars of the band key
    (band keys are md5 hex, so prefixes are uniform)."""
    return F.concat(F.lit("b:"), F.substring(bkey, 1, prefix_len))


def pmod_ckey(prefix: str, col, prefix_len: int = _PREFIX_LEN) -> F.Column:
    """The ONE id-bucketing expression every pmod-keyed cluster space
    uses — '<prefix>' + zero-padded lowercase hex of
    pmod(col, 16^prefix_len), uniform for sequential and hashed ids
    alike. Shared (signature rows, pair rows here; doc-length rows in
    text_index) so write-side ckeys and python-side probe values
    ('%0*x' % (plen, id % 16**plen)) can never drift apart per key
    space — a single definition is the drift guard (round-5 review)."""
    return F.concat(
        F.lit(prefix),
        F.lower(F.lpad(F.hex(F.pmod(col, F.lit(16 ** prefix_len))),
                       prefix_len, "0")),
    )


def _doc_ckey(doc_id, prefix_len: int = _PREFIX_LEN) -> F.Column:
    """Cluster key of a signature row: 's:' + pmod bucket of doc_id."""
    return pmod_ckey("s:", doc_id, prefix_len)


def _pair_ckey(id_a, prefix_len: int = _PREFIX_LEN) -> F.Column:
    """Cluster key of a pair row: 'p:' + pmod bucket of the pair's
    CANONICAL SMALLER member (id_a < id_b by construction) — so
    pairs_view(ids=) reads only the colliding buckets' files.
    Pre-round-5 pools stamped the constant 'p:' (every pair in one
    bucket — a full scan for any consumer); compact_index self-heals
    them to this form."""
    return pmod_ckey("p:", id_a, prefix_len)


class DedupIndexSpec:
    """Declarative index definition.

    `id_expr` / `text_expr`: SQL expressions over the source pool's rows
    producing the document id (long) and text. k/num_hashes/bands/
    threshold mirror functions.dedup.minhash_lsh_pairs.
    """

    def __init__(self, name: str, id_expr: str, text_expr: str,
                 k: int = 3, num_hashes: int = 64, bands: int = 16,
                 threshold: float = 0.5, prefix_len: int = _PREFIX_LEN):
        if num_hashes % bands:
            raise ValueError("num_hashes must divide into bands")
        if not 1 <= prefix_len <= 8:
            raise ValueError("prefix_len must be 1..8 hex chars")
        self.name = name
        self.topic = f"dedupindex:{name}"
        self.id_expr = id_expr
        self.text_expr = text_expr
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        # ckey bucket fan-out (16^prefix_len buckets) — FIXED for the
        # life of the index; see the module constant's comment
        self.prefix_len = prefix_len

    # `keys` duck-types RollupSpec for _spec_cursors' key namespace
    @property
    def keys(self):  # pragma: no cover - structural only
        return {"doc_id": self.id_expr}


def _sig_core(spec: DedupIndexSpec, delta: DataFrame) -> DataFrame:
    """(doc_id, sh_set, sig) for the delta — map-side except the round-12
    under-split spread (the same construction as the batch operator).

    ensure_compute_splits (round 12, the §19.7 trap found a fifth time):
    the delta arrives as a packed pool read — ONE partition — so the
    shingle→64-minhash pipeline, the sync's dominant per-row work, ran on
    one core at ANY delta size. The spread is a delta-sized round-robin
    exchange of the two projected columns, a no-op once the delta has
    real splits; signatures are a pure per-row function, so results are
    unchanged. Measured on the full 3-batch sf0.1 lifecycle, interleaved
    A/B x2: 21.0-29.8 s → 13.7-15.4 s, identical 256-pair set."""
    from zync_spark.functions.compute import ensure_compute_splits
    from zync_spark.functions.dedup import _hashed_set, _minhash_sig_expr
    from zync_spark.functions.text import tokens

    # short-doc drop restated on the cheap `size(tokens) >= k` BEFORE
    # the spread (round 12, the _shingle_sets fix): filtering on
    # size(sh_set) > 0 re-substituted the whole shingle tree into a
    # pushed filter. Equivalent by word_shingles' own < k CASE guard.
    sets = (
        ensure_compute_splits(delta.select(
            F.expr(spec.id_expr).cast("long").alias("doc_id"),
            F.expr(spec.text_expr).alias("__text"),
        ).filter(F.size(tokens(F.col("__text"))) >= spec.k))
        .select("doc_id", _hashed_set(F.col("__text"), spec.k).alias("sh_set"))
    )
    return sets.select("doc_id", "sh_set",
                       _minhash_sig_expr(spec.num_hashes).alias("sig"))


def _bkeys_expr(spec: DedupIndexSpec) -> F.Column:
    """Band digests over a `sig` column (band index in the digest input,
    so equal row-slices in different bands never collide)."""
    rows_per_band = spec.num_hashes // spec.bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(spec.bands - 1)),
        lambda bb: F.md5(
            F.concat_ws(",", bb,
                        F.slice("sig", bb * rows_per_band + 1, rows_per_band))
        ),
    )


def _sig_frame_unfenced(spec: DedupIndexSpec, delta: DataFrame) -> DataFrame:
    """(doc_id, sh_set, bkeys) for the delta, in one lazy plan.

    HOT-PATH CAVEAT (round 9, measured): consuming this frame directly
    lets CollapseProject inline the ENTIRE shingle->minhash pipeline
    into each of the `bands` band-key branches — higher-order functions
    get no common-subexpression reuse, so the whole per-doc signature
    work runs ~16x (204 s vs 41 s of actual work on 50k gsf1 docs,
    tools/profile_dedup_cert.py). The sync path therefore persists
    `_sig_core` FIRST (the cache is the fence — the same reason the
    batch operator persists `sig` before banding, minhash_lsh_pairs)
    and derives bkeys from the cached sig column. This composition is
    kept for cold callers (tests, one-shot migrations) where the 16x
    on a small frame is cheaper than a persist — the _unfenced suffix
    is the structural marker (round-9 ADVICE): do NOT call this on a
    production path; persist _sig_core and band off the cache."""
    return _sig_core(spec, delta).select(
        "doc_id", "sh_set", _bkeys_expr(spec).alias("bkeys"))


def _is_index(spec: DedupIndexSpec):
    return (F.col("zed_type").eqNullSafe("index")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def _is_band(spec: DedupIndexSpec):
    return (F.col("zed_type").eqNullSafe("band")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def _is_pair(spec: DedupIndexSpec):
    return (F.col("zed_type").eqNullSafe("duppair")
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def _stamp(zed_type: str, ckey, df: DataFrame) -> DataFrame:
    return df.select(F.lit(zed_type).alias("zed_type"), ckey.alias("ckey"),
                     *[F.col(c) for c in df.columns])


def _envelope(spec: DedupIndexSpec, df: DataFrame, seq: int) -> DataFrame:
    """Stamp the kafka envelope WITHOUT a global window. The round-3
    formulation assigned offsets with Window.orderBy row_number — a
    single-partition sort funnelling EVERY row of a pass through one
    task, O(pass size) serialized (an initial backfill over an existing
    corpus is the whole index). Index rows need UNIQUE labels, not a
    dense global sequence: partition = the OCC commit sequence this pass
    publishes at (compare-and-set guarantees exactly one pass commits
    per seq, so labels never collide across passes), offset =
    monotonically_increasing_id() (unique within the frame, assigned
    map-side — no exchange at all). Consumers (pairs_view/index_view)
    filter by zed_type and never order by offset."""
    return df.select(
        F.struct(
            F.lit(spec.topic).alias("topic"),
            F.lit(seq).cast("long").alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
        ).alias("kafka"),
        *[F.col(c) for c in df.columns],
    )


def tombstone_index(dest: Pool, spec: DedupIndexSpec, ids) -> int:
    """Delete documents from the index's LATEST state — O(1 commit), no
    read of the stored index: a tombstone row per id (zed_type 'tomb',
    ckey 'x:<pmod(id)>', upto = this pass's commit seq) masks every
    index/band row of the id committed before it, and every pair row
    EITHER of whose members is masked (a duplicate claim about a dead
    document is dead). pairs_view/index_view and sync_index's probes
    apply the mask; compact_index/rebuild_index fold it physically.
    Tombstoning an absent id masks nothing (idempotent, no presence
    probe needed).

    UPDATE flow (CDC): tombstone FIRST, then publish the new version to
    the source and sync_index — the sync re-discovers the new version's
    pairs against the live index, so a re-inserted near-duplicate pair
    simply reappears at a later commit seq (live), while every claim
    about the old version stays masked. Returns rows committed."""
    from zync_spark.streaming.tombstones import (commit_with_retry,
                                                 tomb_rows)

    _check_meta(dest, spec)

    def build(seq: int) -> DataFrame:
        rows = tomb_rows(dest.spark, ids, upto=seq,
                         prefix_len=spec.prefix_len)
        return _envelope(spec, rows, seq)

    return commit_with_retry(dest, build, f"{spec.topic} tombstone")


def _probe_old_bands(dest: Pool, spec: DedupIndexSpec,
                     prefixes: list[str],
                     stats_out: dict | None,
                     tombs: DataFrame | None = None) -> DataFrame | None:
    """(old_id, bkey) rows of the stored index that can collide with the
    delta — read through `scan(bounds=)` so compacted band buckets
    outside the delta's prefixes are skipped at FILE granularity (the
    row-level ckey filter then lets parquet row-group stats prune within
    kept files). `tombs` masks deleted documents so a delta can never
    pair against a dead version (streaming.tombstones). Legacy pools
    (no band rows) fall back to exploding the index rows' bkeys arrays
    — correct but O(index); migrate_band_rows() upgrades them."""
    from zync_spark.streaming.tombstones import mask_rows

    if stats_out is not None:
        stats_out["live_files"] = len(dest.committed_files())
        stats_out["probe_files"] = len(
            dest.committed_files(bounds={"ckey": prefixes}))
    stored = dest.scan(bounds={"ckey": prefixes})
    if stored is None or "zed_type" not in stored.columns \
            or "doc_id" not in stored.columns:
        # empty pool, cursor tombstones only, or every band bucket
        # provably disjoint from the delta: nothing can collide
        return None
    if "bkey" in stored.columns:
        ob = (
            mask_rows(stored.filter(_is_band(spec)
                                    & F.col("ckey").isin(prefixes)),
                      tombs, "doc_id")
            .select(F.col("doc_id").alias("old_id"), "bkey")
        )
        if "bkeys" in stored.columns and "ckey" in stored.columns:
            # MIXED pool: index rows committed before the band-row format
            # have a null ckey (schema widening) and no band rows — they
            # must still be probed, via the legacy explode. Disappears
            # after migrate_band_rows + compact_index (which backfills
            # ckey); until then duplicates with the band rows are
            # possible and cand.distinct() absorbs them.
            legacy = mask_rows(
                stored.filter(_is_index(spec) & F.col("ckey").isNull()),
                tombs, "doc_id")
            ob = ob.unionByName(legacy.select(
                F.col("doc_id").alias("old_id"),
                F.explode("bkeys").alias("bkey")))
        return ob
    if "bkeys" in stored.columns:  # legacy layout: bands live in arrays
        return mask_rows(stored.filter(_is_index(spec)), tombs,
                         "doc_id").select(
            F.col("doc_id").alias("old_id"), F.explode("bkeys").alias("bkey"))
    return None


def _fetch_old_sets(dest: Pool, spec: DedupIndexSpec,
                    dbuckets: list[str],
                    stats_out: dict | None,
                    tombs: DataFrame | None = None) -> DataFrame | None:
    """(doc_id, sh_set) for previously indexed documents in the given
    signature buckets — the exact-Jaccard verification needs the old
    side's shingle set, and only colliding documents' buckets are read
    (`tombs` masks deleted versions, streaming.tombstones)."""
    from zync_spark.streaming.tombstones import mask_rows

    if not dbuckets:
        return None
    if stats_out is not None:
        stats_out["set_files"] = len(
            dest.committed_files(bounds={"ckey": dbuckets}))
    stored = dest.scan(bounds={"ckey": dbuckets})
    if stored is None or "sh_set" not in stored.columns:
        return None
    idx = stored.filter(_is_index(spec))
    if "ckey" in stored.columns:
        # row-level residual of the file-level skip (null-safe: legacy
        # rows have no ckey and must be kept)
        idx = idx.filter(F.col("ckey").isNull()
                         | F.col("ckey").isin(dbuckets))
    return mask_rows(idx, tombs, "doc_id").select("doc_id", "sh_set")


def sync_index(src: Pool, dest: Pool, spec: DedupIndexSpec,
               topics: list[str], message: str | None = None,
               stats_out: dict | None = None,
               auto_compact_every: int | None = None,
               upsert: bool = False) -> int:
    """One incremental maintenance pass. Returns rows appended (index +
    band + pair rows; 0 = no new documents, reruns are no-ops).

    `upsert=True` (one-call CDC): every delta doc_id's PREVIOUS versions
    are tombstoned in the SAME atomic commit — re-published documents
    replace their old index rows/pairs instead of accumulating next to
    them. The pass's stored-state probes mask the superseded versions
    too (a delta row can never pair against the version it replaces),
    and within-batch duplicates collapse to the latest offset before
    indexing. Costs one delta-sized keyed shuffle + the tombstone rows;
    append-only ingest (the default) pays nothing.

    `stats_out` (optional dict) receives the pass's file-skipping
    telemetry: live_files (pool total), probe_files (band probe read),
    set_files (signature fetch read) — the boundedness contract under
    test in test_dedup_index.py.

    `auto_compact_every`: re-cluster the index (compact_index) whenever
    that many delta commits have accreted since the last base — the
    bounded probe is only as good as the ckey clustering, and
    un-compacted commits are always read; same cadence policy as
    FromKafka's auto_compact_every. Single-writer maintenance only (a
    concurrent load would abort the compaction)."""
    n = _sync_index_once(src, dest, spec, topics, message, stats_out,
                         upsert=upsert)
    if (n and auto_compact_every
            and dest.commits_since_base() >= auto_compact_every):
        compact_index(dest, spec=spec)
    return n


def _check_meta(dest: Pool, spec: DedupIndexSpec) -> bool:
    """Validate the caller's spec against the contract persisted at index
    creation; returns whether a meta row exists (sync writes one when it
    doesn't — legacy pools acquire theirs on the next pass). k /
    num_hashes / bands / prefix_len are baked into stored signatures,
    band keys, and ckeys: a drifted spec would not error — it would
    silently produce incomparable signatures and probe past stored
    buckets (missed duplicates). threshold is NOT enforced: it is a
    verification-policy knob applied per pass, stored informationally.
    One bounded 'c:' bucket read; no-op on a fresh pool."""
    if not dest.commits():
        return False
    df = dest.scan(bounds={"ckey": ["c:"]})
    rows = []
    if df is not None and "num_hashes" in df.columns:
        rows = (df.filter(F.col("zed_type").eqNullSafe("meta")
                          & F.col("kafka.topic").eqNullSafe(spec.topic))
                .select("k", "num_hashes", "bands", "prefix_len")
                .limit(1).collect())
    if not rows:
        # pre-meta (legacy) pool: bootstrap-validate prefix_len against
        # the width of any stored bucketed ckey so the first
        # post-upgrade sync cannot bless a drifted fan-out as the
        # creation contract (review finding). k/num_hashes/bands are not
        # derivable from stored hashes — the meta row exists for that.
        full = dest.scan()
        if full is not None and "ckey" in full.columns:
            sample = (full.filter(
                F.col("kafka.topic").eqNullSafe(spec.topic)
                & F.col("ckey").isNotNull()
                # exclude the widthless legacy constant pair bucket and
                # the stats bucket
                & (~F.col("ckey").isin("p:", "c:")))
                .select("ckey").limit(1).collect())
            if sample and len(sample[0]["ckey"]) - 2 != spec.prefix_len:
                raise ValueError(
                    f"dedup index {spec.name!r}: stored ckeys are "
                    f"{len(sample[0]['ckey']) - 2} hex chars wide but the "
                    f"spec says prefix_len={spec.prefix_len} — fixed for "
                    "the life of an index; rebuild the index to change it")
        return False
    stored = tuple(int(rows[0][c])
                   for c in ("k", "num_hashes", "bands", "prefix_len"))
    ours = (spec.k, spec.num_hashes, spec.bands, spec.prefix_len)
    if stored != ours:
        raise ValueError(
            f"dedup index {spec.name!r} was created with (k, num_hashes, "
            f"bands, prefix_len)={stored} but the spec now says {ours} — "
            "these are fixed for the life of an index (stored signatures/"
            "band keys/ckeys embed them); rebuild the index to change them")
    return True


def _sync_index_once(src: Pool, dest: Pool, spec: DedupIndexSpec,
                     topics: list[str], message: str | None,
                     stats_out: dict | None, upsert: bool = False) -> int:
    # Phase decomposition (round-9 ask #3): the pass's Spark actions
    # naturally segment its cost — the cursor collect materializes the
    # delta scan, the prefixes collect materializes signatures+bands
    # (sigs is persisted there), the dbuckets collect materializes the
    # banded probe, and _verify_and_commit materializes exact-Jaccard
    # verify + the clustered write. stats_out receives sec_delta /
    # sec_sigs / sec_probe / sec_verify_commit when provided; timing
    # only, no plan change.
    import time as _time

    def _mark(key, t0):
        if stats_out is not None:
            stats_out[key] = round(_time.perf_counter() - t0, 2)
        return _time.perf_counter()

    _t = _time.perf_counter()
    snapshot = len(dest.commits())
    cursors = _spec_cursors(spec, dest.stored_cursors(), topics)
    delta = scan_delta(src, cursors, topics)
    if delta is None:
        return 0
    delta = delta.persist()
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
        _t = _mark("sec_delta", _t)
        has_meta = _check_meta(dest, spec)
        tombs_new = None
        if upsert:
            from zync_spark.streaming.tombstones import (
                keep_latest_versions, with_upserts)

            latest = keep_latest_versions(delta, spec.id_expr)
            tombs_new = latest.select(
                F.expr(spec.id_expr).cast("long").alias("did"))
            core = _sig_core(spec, latest).persist()
        else:
            core = _sig_core(spec, delta).persist()
        # bkeys derive from the CACHED sig column — the persist is the
        # fence that stops CollapseProject re-inlining the shingle+
        # minhash pipeline into all 16 band branches (see _sig_frame_unfenced's
        # hot-path caveat; measured 16x on this exact path, round 9)
        sigs = core.select("doc_id", "sh_set", _bkeys_expr(spec)
                           .alias("bkeys"))
        try:
            new_bands = sigs.select(
                "doc_id", F.explode("bkeys").alias("bkey"))
            # new x new (within-batch): canonical id_a < id_b
            nb_a = new_bands.select(F.col("doc_id").alias("id_a"), "bkey")
            nb_b = new_bands.select(F.col("doc_id").alias("id_b"), "bkey")
            nn = (nb_a.join(nb_b, "bkey")
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b"))
            # new x index (cross-batch): the pair is discovered when the
            # LATER doc arrives. The delta's band-key PREFIXES bound the
            # stored buckets that can collide (<=256 values — a metadata
            # collect, same class as k-means centroids); stored bands
            # with other prefixes cannot share a bkey, so skipping their
            # files loses nothing.
            prefixes = sorted(
                r["ck"] for r in new_bands
                .select(_band_ckey(F.col("bkey"), spec.prefix_len)
                        .alias("ck"))
                .distinct().collect()
            )
            _t = _mark("sec_sigs", _t)
            cand = nn
            old_sets = None
            from zync_spark.streaming.tombstones import (read_tombs,
                                                          with_upserts)

            tombs = read_tombs(dest, spec.topic) if prefixes else None
            if upsert and prefixes:
                # superseded versions of THIS pass's ids must not pair
                # against the delta either — mask them at probe time
                tombs = with_upserts(tombs, tombs_new, snapshot)
            old_bands = (_probe_old_bands(dest, spec, prefixes, stats_out,
                                          tombs=tombs)
                         if prefixes else None)
            if old_bands is not None:
                no_raw = (new_bands.join(old_bands, "bkey")
                          .filter(F.col("doc_id") != F.col("old_id"))
                          .select("doc_id", "old_id")
                          .persist())
                try:
                    # signature buckets of the colliding old docs — again
                    # a <=256-value metadata collect bounding the fetch
                    dbuckets = sorted(
                        r["ck"] for r in no_raw
                        .select(_doc_ckey(F.col("old_id"),
                                          spec.prefix_len).alias("ck"))
                        .distinct().collect()
                    )
                    old_sets = _fetch_old_sets(dest, spec, dbuckets,
                                               stats_out, tombs=tombs)
                    _t = _mark("sec_probe", _t)
                    no = no_raw.select(
                        F.least("doc_id", "old_id").alias("id_a"),
                        F.greatest("doc_id", "old_id").alias("id_b"))
                    cand = nn.unionByName(no)
                    n = _verify_and_commit(
                        dest, spec, delta, sigs, new_bands, cand, old_sets,
                        new_cursors, snapshot, message, has_meta,
                        tombs_new=tombs_new)
                    _mark("sec_verify_commit", _t)
                    return n
                finally:
                    no_raw.unpersist()
            _t = _mark("sec_probe", _t)
            n = _verify_and_commit(
                dest, spec, delta, sigs, new_bands, cand, old_sets,
                new_cursors, snapshot, message, has_meta,
                tombs_new=tombs_new)
            _mark("sec_verify_commit", _t)
            return n
        finally:
            core.unpersist()
    finally:
        delta.unpersist()


def _verify_and_commit(dest: Pool, spec: DedupIndexSpec, delta: DataFrame,
                       sigs: DataFrame, new_bands: DataFrame,
                       cand: DataFrame, old_sets: DataFrame | None,
                       new_cursors: dict, snapshot: int,
                       message: str | None, has_meta: bool = True,
                       tombs_new: DataFrame | None = None) -> int:
    """Exact-Jaccard verification of the candidate pairs, then the atomic
    index+bands+pairs+cursors commit."""
    cand = cand.distinct()
    all_sets = sigs.select("doc_id", "sh_set")
    if old_sets is not None:
        all_sets = all_sets.unionByName(old_sets)
    inter = F.size(F.array_intersect("set_a", "set_b"))
    # persist the threshold-filtered survivors (round 12, the embdedup
    # sync's round-11 fence): the commit materializes `out` THREE times
    # (load's count job, the clustered write's range sampling, the write
    # itself), and the verify join — including old_sets' parquet fetch —
    # is the only segment of that DAG not already behind the sig cache.
    # The survivor set is tiny by design. Interleaved lifecycle A/B x2:
    # sec_verify_commit 1.6-2.3 → 1.4-1.5 s per warm sync, identical
    # pair sets.
    pairs = (
        cand.join(all_sets.select(F.col("doc_id").alias("id_a"),
                                  F.col("sh_set").alias("set_a")),
                  "id_a")
        .join(all_sets.select(F.col("doc_id").alias("id_b"),
                              F.col("sh_set").alias("set_b")), "id_b")
        .select(
            "id_a", "id_b",
            (inter / (F.size("set_a") + F.size("set_b") - inter))
            .alias("jaccard"))
        .filter(F.col("jaccard") >= spec.threshold)
    ).persist()
    try:
        out = (
            _stamp("index", _doc_ckey(F.col("doc_id"), spec.prefix_len), sigs)
            .unionByName(_stamp("band", _band_ckey(F.col("bkey"),
                                                   spec.prefix_len),
                                new_bands),
                         allowMissingColumns=True)
            .unionByName(_stamp("duppair",
                                _pair_ckey(F.col("id_a"), spec.prefix_len),
                                pairs),
                         allowMissingColumns=True)
        )
        if tombs_new is not None:
            from zync_spark.streaming.tombstones import tomb_rows

            out = out.unionByName(
                tomb_rows(delta.sparkSession, tombs_new, upto=snapshot,
                          prefix_len=spec.prefix_len),
                allowMissingColumns=True)
        if not has_meta:
            # persist the spec contract so a later pass under a DRIFTED
            # spec fails loud (_check_meta) instead of silently missing
            # stored rows
            meta = delta.sparkSession.createDataFrame(
                [(spec.k, spec.num_hashes, spec.bands, spec.prefix_len,
                  float(spec.threshold))],
                "k long, num_hashes long, bands long, prefix_len long,"
                " threshold double")
            out = out.unionByName(_stamp("meta", F.lit("c:"), meta),
                                  allowMissingColumns=True)
        out = _envelope(spec, out, snapshot)
        # cluster the commit itself by ckey (load records per-file stats):
        # the band/signature/pair key spaces land in separate files, so
        # bounded probes skip this commit's non-matching files IMMEDIATELY
        # — boundedness no longer waits for the next compact_index
        n = dest.load(out, message or f"{spec.topic} sync",
                      cursors=new_cursors, occ_token=snapshot,
                      cluster_by=["ckey"])
        if n == 0:
            # Delta had documents but none were indexable (all shorter
            # than the shingle size): Pool.load skips empty frames, so
            # the cursor advance must ride a 1-row tombstone — without
            # it every later pass would re-scan this delta forever.
            # The tombstone's zed_type matches no view filter.
            tomb = delta.sparkSession.createDataFrame(
                [((spec.topic, 0, 0), "cursors")],
                "kafka struct<topic:string,partition:long,offset:long>,"
                " zed_type string",
            )
            return dest.load(tomb, message or f"{spec.topic} sync",
                             cursors=new_cursors, occ_token=snapshot)
        return n
    finally:
        pairs.unpersist()


def _upgrade_and_fill(df: DataFrame, prefix_len: int) -> DataFrame:
    """Compaction transform: (a) MIGRATE any legacy index rows that still
    lack band rows — exploding their bkeys during the rewrite the pool
    was paying anyway, with the reserved partition -1 label — and only
    THEN (b) backfill null ckeys. Order matters: a pre-round-4 revision
    filled ckeys without migrating, which erased the `ckey IS NULL`
    marker the mixed-pool probe fallback keys on and silently hid
    unmigrated docs from all later passes (compaction-before-migration
    footgun, caught in round-4 review). Post-compaction invariant: every
    index row has band rows AND a ckey — the legacy paths go empty."""
    if "zed_type" not in df.columns:
        return df
    if "ckey" not in df.columns:
        df = df.withColumn("ckey", F.lit(None).cast("string"))
    if "doc_id" in df.columns and "bkeys" in df.columns:
        idx = df.filter(F.col("zed_type").eqNullSafe("index"))
        if "bkey" in df.columns:
            have = (df.filter(F.col("zed_type").eqNullSafe("band"))
                    .select("doc_id", F.col("kafka.topic").alias("__t"))
                    .withColumnRenamed("doc_id", "__d").distinct())
            idx = idx.join(
                have,
                (F.col("doc_id") == F.col("__d"))
                & (F.col("kafka.topic") == F.col("__t")),
                "left_anti")
        band = idx.select(
            # labels: same topic as the doc's index row, reserved
            # partition -1 (exactly one base manifest can publish at a
            # given seq, and post-upgrade compactions migrate nothing)
            F.struct(
                F.col("kafka.topic").alias("topic"),
                F.lit(-1).cast("long").alias("partition"),
                F.monotonically_increasing_id().alias("offset"),
            ).alias("kafka"),
            F.lit("band").alias("zed_type"),
            F.lit(None).cast("string").alias("ckey"),
            "doc_id",
            F.explode("bkeys").alias("bkey"),
        )
        df = df.unionByName(band, allowMissingColumns=True)
    fill = F.lit(None).cast("string")
    if "bkey" in df.columns:
        fill = F.when(F.col("zed_type").eqNullSafe("band"),
                      _band_ckey(F.col("bkey"), prefix_len)).otherwise(fill)
    if "doc_id" in df.columns:
        fill = F.when(F.col("zed_type").eqNullSafe("index"),
                      _doc_ckey(F.col("doc_id"), prefix_len)).otherwise(fill)
    if "id_a" in df.columns:
        fill = F.when(F.col("zed_type").eqNullSafe("duppair"),
                      _pair_ckey(F.col("id_a"), prefix_len)).otherwise(fill)
    df = df.withColumn("ckey", F.coalesce(F.col("ckey"), fill))
    if "id_a" in df.columns:
        # pre-round-5 pair rows carry the constant 'p:' (one bucket =
        # full scan for every pairs_view consumer) — rebucket them by
        # id_a during the rewrite, same self-healing as band migration
        df = df.withColumn(
            "ckey",
            F.when(F.col("zed_type").eqNullSafe("duppair")
                   & F.col("ckey").eqNullSafe("p:"),
                   _pair_ckey(F.col("id_a"), prefix_len))
            .otherwise(F.col("ckey")))
    return df


def compact_index(dest: Pool, target_rows: int = 4_000_000,
                  message: str = "dedupindex compact",
                  spec: DedupIndexSpec | None = None) -> int:
    """Range-cluster the index pool by ckey (Pool.compact cluster_by):
    each output file covers a narrow ckey range and records its [min,max]
    in the manifest, so `sync_index`'s bounded probes skip whole files.
    Legacy rows are SELF-HEALED during the rewrite (band rows migrated,
    then ckeys backfilled — _upgrade_and_fill), so compacting a
    pre-band-row pool in any order is safe. Pass `spec` whenever the
    index was created with a non-default prefix_len — stored ckeys and
    probe values must agree exactly. Run on the usual small-files
    cadence (commits_since_base); until it runs, fresh commits carry no
    file stats and are simply always read — boundedness degrades,
    correctness never."""
    from zync_spark.streaming.tombstones import fold_tombstones

    plen = spec.prefix_len if spec is not None else _PREFIX_LEN
    # upgrade first (legacy rows gain band rows + ckeys), THEN fold —
    # the fold drops a dead doc's migrated band rows along with its
    # index/pair rows and the tombstones themselves
    return dest.compact(target_rows=target_rows, message=message,
                        transform=lambda df: fold_tombstones(
                            _upgrade_and_fill(df, plen)),
                        cluster_by=["ckey"])


def rebuild_index(dest: Pool, spec: DedupIndexSpec,
                  prefix_len: int,
                  target_rows: int = 4_000_000,
                  message: str = "dedupindex rebuild") -> DedupIndexSpec:
    """The executable answer to _check_meta's "rebuild the index" for
    the one parameter changeable source-free: prefix_len. Stored index
    rows carry doc_id + bkeys, pair rows id_a — every key space
    re-buckets under the new fan-out, with band rows regenerated by
    exploding the stored bkeys (which also self-heals legacy pools that
    predate band rows, the migrate_band_rows upgrade folded in). One
    atomic Pool.compact publish (OCC claim; a concurrent sync aborts
    the rebuild); cursors carry forward; the meta row is rewritten.

    k / num_hashes / bands CANNOT change here: they are burned into the
    stored signatures (text is never stored) — changing them means
    re-ingesting the source into a fresh index."""
    if not 1 <= int(prefix_len) <= 8:
        raise ValueError("prefix_len must be 1..8 hex chars")
    # the CALLER's spec must be the index's CURRENT contract — otherwise
    # a rebuild run with an already-drifted YAML would bless drifted
    # k/num_hashes/bands into the meta row, after which syncs compute
    # incomparable signatures, silently (review finding)
    _check_meta(dest, spec)
    new_pl = int(prefix_len)

    def _tx(df: DataFrame) -> DataFrame:
        if "doc_id" not in df.columns or "bkeys" not in df.columns:
            raise ValueError(
                f"rebuild_index: index {spec.name!r} has no stored rows")
        # fold tombstones FIRST: masked rows must not re-bucket, and the
        # topic's tomb rows must not be dropped un-applied below
        from zync_spark.streaming.tombstones import fold_tombstones

        df = fold_tombstones(df)
        idx = df.filter(_is_index(spec)).select(
            "doc_id", "sh_set", "bkeys")
        bands = idx.select("doc_id", F.explode("bkeys").alias("bkey"))
        pairs = (df.filter(_is_pair(spec)).select("id_a", "id_b", "jaccard")
                 if "id_a" in df.columns else None)
        meta = df.sparkSession.createDataFrame(
            [(spec.k, spec.num_hashes, spec.bands, new_pl,
              float(spec.threshold))],
            "k long, num_hashes long, bands long, prefix_len long,"
            " threshold double")
        out = (
            idx.select(
                F.lit("index").alias("zed_type"),
                _doc_ckey(F.col("doc_id"), new_pl).alias("ckey"),
                "doc_id", "sh_set", "bkeys")
            .unionByName(bands.select(
                F.lit("band").alias("zed_type"),
                _band_ckey(F.col("bkey"), new_pl).alias("ckey"),
                "doc_id", "bkey"), allowMissingColumns=True)
        )
        if pairs is not None:
            out = out.unionByName(pairs.select(
                F.lit("duppair").alias("zed_type"),
                _pair_ckey(F.col("id_a"), new_pl).alias("ckey"),
                "id_a", "id_b", "jaccard"), allowMissingColumns=True)
        out = out.unionByName(meta.select(
            F.lit("meta").alias("zed_type"),
            F.lit("c:").alias("ckey"),
            "k", "num_hashes", "bands", "prefix_len", "threshold"),
            allowMissingColumns=True)
        # fresh labels on the reserved partition -2 for EVERY rebuilt row
        # (the rebuild_spans/rebuild_ann convention): exploded band rows
        # must not inherit their parent index row's label — ~bands+1 rows
        # sharing one (topic, partition, offset) would break the unique-
        # label invariant _envelope documents as load-bearing (review)
        out = out.select(
            F.struct(
                F.lit(spec.topic).alias("topic"),
                F.lit(-2).cast("long").alias("partition"),
                F.monotonically_increasing_id().alias("offset"),
            ).alias("kafka"),
            *[F.col(c) for c in out.columns],
        )
        others = df.filter(~F.col("kafka.topic").eqNullSafe(spec.topic))
        return out.unionByName(others, allowMissingColumns=True)

    dest.compact(target_rows=target_rows, message=message, transform=_tx,
                 cluster_by=["ckey"])
    return DedupIndexSpec(spec.name, spec.id_expr, spec.text_expr,
                          k=spec.k, num_hashes=spec.num_hashes,
                          bands=spec.bands, threshold=spec.threshold,
                          prefix_len=new_pl)


def migrate_band_rows(dest: Pool, spec: DedupIndexSpec) -> int:
    """One-time upgrade of a pool written before the band-row format:
    explode the bkeys of every stored index row that has no band rows
    yet into band rows and commit them (anti-join, so mixed pools — part
    legacy, part new-format — migrate exactly their legacy remnant).
    Until migration, sync_index probes legacy rows via the full-scan
    fallback (correct, O(legacy)); after it (+ compact_index, which
    backfills their ckeys) probes are fully bounded. No-op when every
    indexed doc already has band rows."""
    df = dest.scan()
    if df is None or "doc_id" not in df.columns or "bkeys" not in df.columns:
        return 0
    idx = df.filter(_is_index(spec)).select("doc_id", "bkeys")
    if "bkey" in df.columns:
        have = df.filter(_is_band(spec)).select("doc_id").distinct()
        idx = idx.join(have, "doc_id", "left_anti")
    band = idx.select("doc_id", F.explode("bkeys").alias("bkey"))
    from zync_spark.pool import ConcurrentWriteError

    # Label integrity: _envelope stamps partition = the commit seq, and
    # the uniqueness argument rests on exactly one commit per seq — so
    # the migration must publish at EXACTLY the seq its labels carry
    # (occ_token), retrying with fresh labels if a concurrent sync won
    # the race (a plain append would relabel nothing and collide).
    for _ in range(8):
        seq = len(dest.commits())
        out = _envelope(
            spec,
            _stamp("band", _band_ckey(F.col("bkey"), spec.prefix_len), band),
            seq)
        try:
            return dest.load(out, f"{spec.topic} band-row migration",
                             occ_token=seq, cluster_by=["ckey"])
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"{spec.topic}: migration lost the commit race repeatedly; re-run")


def pairs_view(dest: Pool, spec: DedupIndexSpec,
               ids: list[int] | None = None,
               stats_out: dict | None = None) -> DataFrame | None:
    """Duplicate pairs discovered so far: (id_a, id_b, jaccard).

    `ids` bounds the read to pairs whose CANONICAL SMALLER member (id_a
    — pairs are stored with id_a < id_b) is in the set: only those ids'
    'p:' buckets are probed (`scan(bounds=)` point-set file skipping,
    the same contract as the band probe), so a point lookup over a
    100 TB index reads ~len(ids)/16^prefix_len of the pair space. To
    bound by EITHER member, pass both candidate ids — the caller knows
    which side is smaller iff it knows both. The probe set includes the
    legacy constant 'p:' bucket, so pools compacted before the
    bucketed-pair format stay visible until compact_index rebuckets
    them. `stats_out` receives live_files/probe_files (the boundedness
    pin under test). ids=None returns the full view."""
    _check_meta(dest, spec)
    if ids is None:
        df = dest.scan()
    else:
        buckets = sorted({
            "p:%0*x" % (spec.prefix_len, i % (16 ** spec.prefix_len))
            for i in ids
        }) + ["p:"]  # legacy constant bucket: always probed (see above)
        if stats_out is not None:
            stats_out["live_files"] = len(dest.committed_files())
            stats_out["probe_files"] = len(
                dest.committed_files(bounds={"ckey": buckets}))
        df = dest.scan(bounds={"ckey": buckets})
    if df is None or "zed_type" not in df.columns:
        return None
    if "id_a" not in df.columns:
        # only cursor tombstones committed so far: empty typed frame
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, jaccard double")
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    tombs = read_tombs(dest, spec.topic)
    out = mask_rows(mask_rows(df.filter(_is_pair(spec)), tombs, "id_a"),
                    tombs, "id_b").select("id_a", "id_b", "jaccard")
    if ids is not None:
        # the row-level residual of the file-level skip (ckey is a pure
        # function of id_a, so this filter alone is the true predicate)
        out = out.filter(F.col("id_a").isin([int(i) for i in ids]))
    return out


def index_view(dest: Pool, spec: DedupIndexSpec) -> DataFrame | None:
    """The stored index: (doc_id, sh_set, bkeys)."""
    _check_meta(dest, spec)
    df = dest.scan()
    if df is None or "zed_type" not in df.columns:
        return None
    if "doc_id" not in df.columns:
        return df.sparkSession.createDataFrame(
            [], "doc_id long, sh_set array<long>, bkeys array<string>")
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    return mask_rows(df.filter(_is_index(spec)),
                     read_tombs(dest, spec.topic),
                     "doc_id").select("doc_id", "sh_set", "bkeys")


def load_index_spec(path: str) -> tuple[DedupIndexSpec, dict]:
    """Parse a dedup-index spec YAML (the CLI's format for `dedup-index`);
    returns (spec, raw_doc) — the doc carries the routing fields
    (source/dest/topics) the caller resolves to pools."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if doc.get("kind") not in (None, "dedup"):
        # a text-index spec's fields are a subset of this format — refuse
        # loudly instead of silently building the wrong index kind
        raise ValueError(
            f"{path}: kind={doc['kind']!r} is not a dedup-index spec "
            "(use the matching subcommand / spec loader)")
    spec = DedupIndexSpec(
        doc["name"],
        id_expr=doc["id"],
        text_expr=doc["text"],
        k=int(doc.get("k", 3)),
        num_hashes=int(doc.get("num_hashes", 64)),
        bands=int(doc.get("bands", 16)),
        threshold=float(doc.get("threshold", 0.5)),
        prefix_len=int(doc.get("prefix_len", _PREFIX_LEN)),
    )
    return spec, doc
