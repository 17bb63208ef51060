"""Incrementally maintained duplicated-SPAN index over a document pool
— the fourth pool-backed index family (MinHash-LSH dedup, IVF ANN, BM25
text search), giving the ExactSubstr operator
(`functions.dedup.duplicate_spans`) an O(delta) maintenance path: the
batch operator rehashes the WHOLE corpus per run; a pipeline ingesting
continuously wants each pass to cost O(new documents + colliding
buckets), with the accumulated duplicated-span set always queryable.

Storage model (one pool, three ckey-bucketed key spaces, the shared
scan(bounds=) file-skipping contract):

- `win` rows (h, doc_id, pos), ckey 'w:<pmod(h) hex>': every sliding
  window of every ingested document, bucketed by window hash — the
  stored inverted index a delta probes for collisions.
- `hit` rows (doc_id, pos), ckey 'h:<pmod(doc_id) hex>': positions KNOWN
  duplicated, bucketed by doc so `spans_view(doc_ids=)` reads only the
  asked-for documents' buckets.
- `dup` rows (h), ckey 'd:<pmod(h) hex>': hashes already known
  duplicated — the exactly-once guard. The first pass in which a hash
  satisfies the duplication rule emits hits for ALL its occurrences
  (stored + delta) and one dup marker; later passes see the marker (it
  lives in the same probed bucket space) and emit hits for their OWN
  delta positions only. A (doc, pos) belongs to exactly one hash, so no
  hit row is ever written twice.
- `fwd` rows (doc_id, h), ckey 'f:<pmod(doc_id) hex>': the FORWARD
  index — each doc's distinct window hashes, bucketed by doc. Written
  so `tombstone_spans` can find a deleted doc's hashes boundedly (win
  rows are bucketed by HASH; without the forward rows a delete would
  scan the whole 'w:' space). The price of delete support.
- `tomb`/`undup`/`unhit` rows: delete machinery (tombstone_spans) —
  doc tombstones in 'x:' buckets; per-hash duplication RETRACTIONS in
  the same 'd:' buckets the dup markers live in; per-(doc,pos) hit
  retractions in the same 'h:' buckets the hits live in. All masked by
  commit-seq comparison (streaming/tombstones.py) and folded physically
  at compaction/rebuild.

Per pass: cursor-bounded delta scan → window rows (the SAME
`window_hash_rows` expression the batch operator compiles, so the two
can never disagree on what a window is) → bounded probe of the delta
hashes' `w:`/`d:` buckets → duplication rule over stored∪delta
occurrences (>= min_docs distinct docs AND >= 2 occurrences — monotone
in the ingested prefix, which is what makes incremental == batch) → ONE
atomic ckey-clustered commit (wins + hits + dup markers + advanced
cursors, Pool.load occ_token compare-and-set). Crash-safe; rerun = no-op.

`spans_view` merges the accumulated hits gaps-and-islands style into
maximal spans — across commits, so two batches each contributing half
of a contiguous duplicated region still yield ONE span, and the view
over any batch split is IDENTICAL to `duplicate_spans` over the full
corpus (differential-tested; the catalog entry hash-checks it against
the batch operator's verbatim-window-text SQL oracle).

Probe-boundedness honesty (where this index differs from the other
three): a delta contributes ~one window hash per TOKEN, so its bucket
coverage saturates much faster than a band-key or term probe —
expected coverage is 1-(1-1/B)^|delta hashes| of the `w:`/`d:` spaces.
Size `prefix_len` to the per-pass delta, not the corpus: B=16^prefix_len
should be >> the typical delta's token count (prefix_len=3 → 4096
buckets suits ~100-token micro-batches; 4 → 65536 suits document-sized
ones). The `h:` hit space is doc-bucketed and never probed at sync time.
Whatever the coverage, text itself is never re-read: the probe moves
16-byte (h, doc, pos) rows, and a saturated probe degrades to the batch
operator's cost — never worse.

Updates/deletes: `tombstone_spans` deletes documents from the LATEST
state in O(deleted docs' hash buckets) — it masks the docs' rows AND
retracts the duplication status of SURVIVING docs whose hashes no
longer satisfy the rule (the non-trivial part: removing one copy of a
twice-occurring span un-duplicates the other copy). The CDC update flow
is tombstone FIRST, then re-publish + sync — a hash whose rule is
re-satisfied by the new version re-dups and its hits re-emit at a later
commit seq, exactly reproducing the batch operator over the latest
corpus (differential-tested).

Reference parity: the reference has no dedup surface (beyond-reference
module); the commit/cursor machinery mirrors its done-marker design
(README.md:447-455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.functions.dedup import window_hash_rows
from zync_spark.pool import Pool
from zync_spark.streaming.dedup_index import _envelope, _stamp, pmod_ckey
from zync_spark.streaming.incremental import _spec_cursors, scan_delta

_PREFIX_LEN = 2  # see the boundedness note above: size to the DELTA


class SpanIndexSpec:
    """Declarative index definition. `id_expr`/`text_expr`: SQL
    expressions over the source pool's rows producing the document id
    (long) and text; `window`/`min_docs`: the duplicate_spans knobs.
    window, min_docs AND prefix_len are all FIXED for the life of the
    index — stored hashes embed the window length and stored ckeys embed
    the bucket fan-out. The contract is persisted in the pool at
    creation ('meta' row) and every later sync/view validates against it
    (_check_meta), so a drifted spec fails loud instead of silently
    missing stored rows."""

    def __init__(self, name: str, id_expr: str, text_expr: str,
                 window: int = 8, min_docs: int = 2,
                 prefix_len: int = _PREFIX_LEN):
        if not 1 <= prefix_len <= 8:
            raise ValueError("prefix_len must be 1..8 hex chars")
        if window < 2:
            raise ValueError("window must be >= 2 tokens")
        if min_docs < 1:
            raise ValueError("min_docs must be >= 1")
        self.name = name
        self.topic = f"spanindex:{name}"
        self.id_expr = id_expr
        self.text_expr = text_expr
        self.window = window
        self.min_docs = min_docs
        self.prefix_len = prefix_len

    # duck-types RollupSpec for _spec_cursors' key namespace
    @property
    def keys(self):  # pragma: no cover - structural only
        return {"doc_id": self.id_expr}


def _is(spec: SpanIndexSpec, zed_type: str):
    return (F.col("zed_type").eqNullSafe(zed_type)
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def sync_spans(src: Pool, dest: Pool, spec: SpanIndexSpec,
               topics: list[str], message: str | None = None,
               stats_out: dict | None = None,
               auto_compact_every: int | None = None,
               upsert: bool = False) -> int:
    """One incremental maintenance pass; returns rows appended (win +
    hit + dup; 0 = no new documents, reruns are no-ops). `stats_out`
    receives live_files/probe_files — the file-skipping telemetry under
    test. `auto_compact_every`: re-cluster (compact_spans) after that
    many delta commits since the last base; single-writer maintenance
    only — the same cadence contract as the other index maintainers.

    `upsert=True` (one-call CDC): every delta doc_id's previous versions
    are tombstoned in the SAME atomic commit, INCLUDING the retraction
    math — the old versions' window hashes (from their 'f:' forward
    buckets) join the recount scope, so a rule that the superseded
    version alone satisfied is retracted (undup/unhit) and one the new
    version re-satisfies re-emits, exactly as a tombstone_spans +
    republish + sync sequence would produce. Within-batch duplicates
    collapse to the latest offset first. Requires the forward key space
    (any post-round-6 index; legacy pools: rebuild_spans once)."""
    n = _sync_spans_once(src, dest, spec, topics, message, stats_out,
                         upsert=upsert)
    if (n and auto_compact_every
            and dest.commits_since_base() >= auto_compact_every):
        compact_spans(dest)
    return n


def _sync_spans_once(src: Pool, dest: Pool, spec: SpanIndexSpec,
                     topics: list[str], message: str | None,
                     stats_out: dict | None, upsert: bool = False) -> int:
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
        src_rows = delta
        tombs_new = None
        if upsert:
            from zync_spark.streaming.tombstones import keep_latest_versions

            if dest.commits() and not _has_forward(dest, spec):
                raise ValueError(
                    f"span index {spec.name!r}: upsert sync needs the "
                    "forward ('f:') key space — run rebuild_spans() once")
            src_rows = keep_latest_versions(delta, spec.id_expr)
            tombs_new = src_rows.select(
                F.expr(spec.id_expr).cast("long").alias("did")).distinct()
        docs = src_rows.select(
            F.expr(spec.id_expr).cast("long").alias("doc_id"),
            F.expr(spec.text_expr).alias("text"),
        )
        has_meta = _check_meta(dest, spec)
        wins_d = window_hash_rows(
            docs, "doc_id", "text", spec.window
        ).persist()
        fences: list[DataFrame] = []
        try:
            # the delta's hash-bucket footprint — a <=16^prefix_len-value
            # metadata collect (same shape as the other indexes' probes).
            # The prefixes come from pmod_ckey ITSELF, the single shared
            # bucketing definition, so write-side ckeys and probe values
            # cannot drift (the same guard the other families rely on);
            # the 'd:' space shares pmod(h), so its values are derived
            # from the same output.
            w_prefixes = sorted(
                r["ck"] for r in wins_d.select(
                    pmod_ckey("w:", F.col("h"), spec.prefix_len).alias("ck"))
                .distinct().collect()
            )
            from zync_spark.streaming.tombstones import (mask_rows,
                                                          read_tombs,
                                                          with_upserts)

            tombs = read_tombs(dest, spec.topic)
            d_hashes = wins_d.select("h").distinct()
            if tombs_new is not None:
                # the SUPERSEDED versions' hashes join the recount scope
                # (their 'f:' forward buckets, masked by prior tombs
                # only — the rows being superseded are exactly the ones
                # whose hashes we need), and the probe must also cover
                # their buckets so retraction sees the stored state
                from zync_spark.streaming.tombstones import id_buckets

                fbuckets = id_buckets(tombs_new, "f:", spec.prefix_len)
                fstored = dest.scan(bounds={"ckey": fbuckets})
                if fstored is not None and "h" in fstored.columns:
                    old_h = (mask_rows(
                        fstored.filter(_is(spec, "fwd"))
                        .join(tombs_new.withColumnRenamed("did", "doc_id"),
                              "doc_id", "left_semi"),
                        tombs, "doc_id")
                        .select("h").distinct())
                    d_hashes = d_hashes.unionByName(old_h).distinct()
                    w_prefixes = sorted({
                        r["ck"] for r in d_hashes.select(
                            pmod_ckey("w:", F.col("h"),
                                      spec.prefix_len).alias("ck"))
                        .distinct().collect()})
                # stored reads must not see the superseded versions
                tombs = with_upserts(tombs, tombs_new, snapshot)
            stored_w, known_dup = _probe(dest, spec, w_prefixes, stats_out,
                                         tombs=tombs)
            if stored_w is not None:
                stored_w = stored_w.join(d_hashes, "h")
            if known_dup is not None:
                known_dup = known_dup.join(d_hashes, "h")
            occ = wins_d.select("h", "doc_id", "pos")
            if stored_w is not None:
                occ = occ.unionByName(stored_w)
            # the duplication rule over everything ingested so far that
            # shares a hash with the delta (monotone, so evaluating it
            # lazily — only when a hash reappears — is exact)
            # fence the rule evaluation (round 12, the dedup-sync
            # finding): the commit materializes `out` three times
            # (load's count, the clustered write's range sampling, the
            # write), and everything below `occ` — the stored-window
            # parquet probe, the satisfied aggregation, the hit joins —
            # re-ran each time; wins_d's cache covered only the delta
            # side. The fenced frames are dup-hash/hit-position sized.
            satisfied = (
                occ.groupBy("h")
                .agg(F.count_distinct("doc_id").alias("nd"),
                     F.count(F.lit(1)).alias("nt"))
                .filter((F.col("nd") >= spec.min_docs) & (F.col("nt") >= 2))
                .select("h")
            ).persist()
            fences.append(satisfied)
            newly_dup = (satisfied.join(known_dup, "h", "left_anti")
                         if known_dup is not None else satisfied)
            hits_new = occ.join(newly_dup, "h").select("doc_id", "pos")
            undup_new = unhit_new = None
            if tombs_new is not None and known_dup is not None:
                # retraction: scoped hashes whose rule the superseded
                # versions alone satisfied (live recount fails) — same
                # math as tombstone_spans, inside the one commit. A
                # retracted hash must NOT emit delta hits below (its new
                # hit rows would outlive the same-seq unhit/undup), so
                # the known-dup hit branch keeps only still-satisfied
                # hashes on the upsert path.
                undup_new = known_dup.join(satisfied, "h",
                                           "left_anti").persist()
                fences.append(undup_new)
                unhit_new = occ.join(undup_new, "h").select(
                    "doc_id", "pos").persist()
                fences.append(unhit_new)
                known_for_hits = known_dup.join(satisfied, "h", "left_semi")
            elif known_dup is not None:
                known_for_hits = known_dup
            if known_dup is not None:
                hits_new = hits_new.unionByName(
                    wins_d.join(known_for_hits, "h").select("doc_id", "pos"))
            # the hit branch still walks occ (stored parquet) per
            # evaluation — fence the final frame
            hits_new = hits_new.persist()
            fences.append(hits_new)
            plen = spec.prefix_len
            # forward rows: each delta doc's distinct hashes, bucketed
            # by doc — what makes tombstone_spans's retraction bounded
            fwd = wins_d.select("doc_id", "h").distinct()
            out = (
                _stamp("win", pmod_ckey("w:", F.col("h"), plen),
                       wins_d.select("h", "doc_id", "pos"))
                .unionByName(
                    _stamp("hit", pmod_ckey("h:", F.col("doc_id"), plen),
                           hits_new), allowMissingColumns=True)
                .unionByName(
                    _stamp("dup", pmod_ckey("d:", F.col("h"), plen),
                           newly_dup), allowMissingColumns=True)
                .unionByName(
                    _stamp("fwd", pmod_ckey("f:", F.col("doc_id"), plen),
                           fwd), allowMissingColumns=True)
            )
            if tombs_new is not None:
                from zync_spark.streaming.tombstones import tomb_rows

                out = out.unionByName(
                    tomb_rows(delta.sparkSession, tombs_new,
                              upto=snapshot, prefix_len=plen),
                    allowMissingColumns=True)
                if undup_new is not None:
                    out = (out.unionByName(
                        _stamp("undup", pmod_ckey("d:", F.col("h"), plen),
                               undup_new), allowMissingColumns=True)
                        .unionByName(
                            _stamp("unhit",
                                   pmod_ckey("h:", F.col("doc_id"), plen),
                                   unhit_new), allowMissingColumns=True))
            if not has_meta:
                # persist the spec contract so a later sync or view
                # under a DRIFTED spec fails loud (_check_meta) instead
                # of silently missing stored rows — window and
                # prefix_len are baked into stored hashes and ckeys
                # forward=1 records that every synced doc has fwd rows
                # — the capability tombstone_spans requires (legacy
                # pools lack it until rebuild_spans regenerates them)
                meta = delta.sparkSession.createDataFrame(
                    [(spec.window, spec.min_docs, spec.prefix_len, 1)],
                    "window long, min_docs long, prefix_len long,"
                    " forward long")
                out = out.unionByName(_stamp("meta", F.lit("c:"), meta),
                                      allowMissingColumns=True)
            n = dest.load(_envelope(spec, out, snapshot),
                          message or f"{spec.topic} sync",
                          cursors=new_cursors, occ_token=snapshot,
                          cluster_by=["ckey"])
            if n == 0:
                # delta had rows but no windowable docs: cursor tombstone,
                # same rationale as the other index maintainers
                tomb = delta.sparkSession.createDataFrame(
                    [((spec.topic, 0, 0), "cursors")],
                    "kafka struct<topic:string,partition:long,offset:long>,"
                    " zed_type string",
                )
                return dest.load(tomb, message or f"{spec.topic} sync",
                                 cursors=new_cursors, occ_token=snapshot)
            return n
        finally:
            wins_d.unpersist()
            for f in fences:
                f.unpersist()
    finally:
        delta.unpersist()


def _check_meta(dest: Pool, spec: SpanIndexSpec) -> bool:
    """Validate the caller's spec against the contract persisted at
    index creation; returns whether a meta row exists (sync writes one
    when it doesn't). window/min_docs/prefix_len are FIXED for the life
    of an index — stored hashes embed the window length and stored ckeys
    embed the bucket fan-out, so a drifted spec would not error: it
    would silently stop seeing stored rows (missed duplicates, skipped
    span files). One bounded 'c:' bucket read; no-op on a fresh pool."""
    if not dest.commits():
        return False
    df = dest.scan(bounds={"ckey": ["c:"]})
    rows = []
    if df is not None and "window" in df.columns:
        rows = df.filter(_is(spec, "meta")) \
            .select("window", "min_docs", "prefix_len").limit(1).collect()
    if not rows:
        # pre-meta pool: bootstrap-validate prefix_len against the WIDTH
        # of any stored bucketed ckey (it is sitting in the pool) so the
        # first post-upgrade sync cannot bless a drifted fan-out as the
        # creation contract (review finding). window is not derivable
        # from stored hashes — the meta row exists for exactly that.
        full = dest.scan()
        if full is not None and "ckey" in full.columns:
            sample = (full.filter(
                F.col("kafka.topic").eqNullSafe(spec.topic)
                & F.col("ckey").isNotNull() & (F.col("ckey") != "c:"))
                .select("ckey").limit(1).collect())
            if sample and len(sample[0]["ckey"]) - 2 != spec.prefix_len:
                raise ValueError(
                    f"span index {spec.name!r}: stored ckeys are "
                    f"{len(sample[0]['ckey']) - 2} hex chars wide but the "
                    f"spec says prefix_len={spec.prefix_len} — fixed for "
                    "the life of an index; rebuild the index to change it")
        return False
    stored = (int(rows[0]["window"]), int(rows[0]["min_docs"]),
              int(rows[0]["prefix_len"]))
    ours = (spec.window, spec.min_docs, spec.prefix_len)
    if stored != ours:
        raise ValueError(
            f"span index {spec.name!r} was created with (window, min_docs, "
            f"prefix_len)={stored} but the spec now says {ours} — these are "
            "fixed for the life of an index (stored hashes/ckeys embed "
            "them); rebuild the index to change them")
    return True


def _probe(dest: Pool, spec: SpanIndexSpec, w_prefixes: list[str],
           stats_out: dict | None, tombs: DataFrame | None = None):
    """(LIVE stored win rows, LIVE dup-marker hash set) for the delta's
    hash buckets — one scan over the combined 'w:'/'d:' point set, file-
    skipped via the manifest's ckey stats; row-level ckey residual
    applied on top. `tombs` masks deleted documents' win rows; a dup
    marker is live iff no LATER undup retraction exists for its hash
    (commit-seq comparison — both marker types share the 'd:' buckets,
    so the probe that finds one finds the other)."""
    from zync_spark.streaming.tombstones import mask_rows

    prefixes = w_prefixes + ["d:" + ck[2:] for ck in w_prefixes]
    if stats_out is not None:
        stats_out["live_files"] = len(dest.committed_files())
        stats_out["probe_files"] = len(
            dest.committed_files(bounds={"ckey": prefixes}))
    stored = dest.scan(bounds={"ckey": prefixes})
    if stored is None or "zed_type" not in stored.columns \
            or "h" not in stored.columns:
        return None, None
    if "ckey" in stored.columns:
        stored = stored.filter(F.col("ckey").isin(prefixes))
    wins = mask_rows(stored.filter(_is(spec, "win")), tombs,
                     "doc_id").select("h", "doc_id", "pos")
    dups = _live_dup_set(stored, spec)
    return wins, dups


def _live_dup_set(stored: DataFrame, spec: SpanIndexSpec) -> DataFrame:
    """(h) hashes whose duplication status is currently asserted: the
    latest marker per hash wins (dup at seq D is retracted by an undup
    at seq U > D; a later re-dup at seq > U re-asserts). Marker rows are
    single-purpose and tiny relative to wins."""
    dup_m = (stored.filter(_is(spec, "dup"))
             .groupBy("h").agg(F.max("kafka.partition").alias("__d")))
    undup_m = (stored.filter(_is(spec, "undup"))
               .groupBy("h").agg(F.max("kafka.partition").alias("__u")))
    return (dup_m.join(undup_m, "h", "left")
            .filter(F.col("__u").isNull() | (F.col("__d") >= F.col("__u")))
            .select("h"))


def _has_forward(dest: Pool, spec: SpanIndexSpec) -> bool:
    """Does the stored meta row assert the forward ('f:') key space?
    (Written by every post-round-6 sync; legacy pools acquire it via
    rebuild_spans, which regenerates fwd rows from the stored wins.)"""
    df = dest.scan(bounds={"ckey": ["c:"]})
    if df is None or "forward" not in df.columns:
        return False
    rows = (df.filter(_is(spec, "meta")).select("forward")
            .limit(1).collect())
    return bool(rows) and rows[0]["forward"] == 1


def tombstone_spans(dest: Pool, spec: SpanIndexSpec, ids,
                    stats_out: dict | None = None) -> int:
    """Delete documents from the index's LATEST state — O(deleted docs'
    hash buckets), never a corpus scan — in ONE atomic commit carrying:

    - a tombstone row per id ('x:' bucket): masks the docs' win/hit/fwd
      rows everywhere (views, sync probes, folds);
    - 'undup' retraction markers ('d:' buckets): for each hash the
      deleted docs touched whose duplication rule is NO LONGER satisfied
      by the live occurrences, the dup assertion is retracted — the
      non-trivial delete semantics: removing one copy of a
      twice-occurring span un-duplicates the OTHER copy;
    - 'unhit' rows ('h:' buckets): per-(doc,pos) hit retractions for the
      SURVIVING docs' positions at those no-longer-duplicated hashes.

    The deleted docs' hashes come from their 'f:' forward buckets (one
    point-set read), the recount probes only those hashes' 'w:'/'d:'
    buckets — the same boundedness (and the same saturation honesty
    note) as a sync pass. Tombstoning an absent or already-deleted id
    retracts nothing (idempotent). Requires the forward key space
    (every post-round-6 index; legacy pools: run rebuild_spans once).

    UPDATE flow (CDC): tombstone FIRST, then re-publish + sync_spans —
    a rule re-satisfied by the new version re-dups at a later seq and
    its hits re-emit for every live occurrence (differential-tested
    against the batch operator over the latest corpus)."""
    from zync_spark.streaming.tombstones import (commit_with_retry,
                                                 id_buckets, ids_frame,
                                                 read_tombs, tomb_rows)

    _check_meta(dest, spec)
    if not _has_forward(dest, spec):
        raise ValueError(
            f"span index {spec.name!r} predates the forward ('f:') key "
            "space that deletes need to find a doc's window hashes "
            "boundedly — run rebuild_spans() once to regenerate it from "
            "the stored windows")
    plen = spec.prefix_len
    idf = ids_frame(dest.spark, ids).persist()
    dying = idf.withColumnRenamed("did", "doc_id")
    # fences live until AFTER commit_with_retry's load (round 12): the
    # old shape unpersisted `affected` inside build's finally — BEFORE
    # the load's two materializations of the returned frame ran, so the
    # forward-bucket probe and the live recount re-ran per
    # materialization. Each retry's frames accrete here and are all
    # released in the outer finally. The fenced frames are
    # hash-set/retraction-row sized.
    fences: list[DataFrame] = []

    def build(seq: int) -> DataFrame:
        from zync_spark.streaming.tombstones import mask_rows

        spark = dest.spark
        out = tomb_rows(spark, idf, upto=seq, prefix_len=plen)
        tombs_prev = read_tombs(dest, spec.topic)
        # a <=16^prefix_len-value bucket collect — the delete set itself
        # stays a DataFrame end to end
        fbuckets = id_buckets(idf, "f:", plen)
        fstored = dest.scan(bounds={"ckey": fbuckets})
        affected = None
        if fstored is not None and "h" in fstored.columns:
            affected = (mask_rows(
                fstored.filter(_is(spec, "fwd"))
                .join(dying, "doc_id", "left_semi"),
                tombs_prev, "doc_id")
                .select("h").distinct().persist())
            fences.append(affected)
        if affected is None:
            return _envelope(spec, out, seq)
        w_prefixes = sorted(
            r["ck"] for r in affected.select(
                pmod_ckey("w:", F.col("h"), plen).alias("ck"))
            .distinct().collect())
        if not w_prefixes:
            return _envelope(spec, out, seq)
        stored_w, live_dup = _probe(dest, spec, w_prefixes, stats_out,
                                    tombs=tombs_prev)
        if stored_w is None:
            return _envelope(spec, out, seq)
        # live occurrences AFTER this delete: stored wins already
        # masked by prior tombs, restricted to the affected hashes,
        # minus the dying docs themselves
        live = (stored_w.join(affected, "h")
                .join(dying, "doc_id", "left_anti"))
        still = (
            live.groupBy("h")
            .agg(F.count_distinct("doc_id").alias("nd"),
                 F.count(F.lit(1)).alias("nt"))
            .filter((F.col("nd") >= spec.min_docs)
                    & (F.col("nt") >= 2))
            .select("h"))
        dying_dup = None
        if live_dup is not None:
            dying_dup = (live_dup.join(affected, "h")
                         .join(still, "h", "left_anti")).persist()
            fences.append(dying_dup)
        if dying_dup is not None:
            unhit = live.join(dying_dup, "h").select(
                "doc_id", "pos").persist()
            fences.append(unhit)
            out = (out.unionByName(
                _stamp("undup", pmod_ckey("d:", F.col("h"), plen),
                       dying_dup), allowMissingColumns=True)
                .unionByName(
                    _stamp("unhit",
                           pmod_ckey("h:", F.col("doc_id"), plen),
                           unhit), allowMissingColumns=True))
        return _envelope(spec, out, seq)

    try:
        return commit_with_retry(dest, build, f"{spec.topic} tombstone")
    finally:
        idf.unpersist()
        for f in fences:
            f.unpersist()


def rebuild_spans(dest: Pool, spec: SpanIndexSpec,
                  min_docs: int | None = None,
                  prefix_len: int | None = None,
                  target_rows: int = 4_000_000,
                  message: str = "spanindex rebuild") -> SpanIndexSpec:
    """The executable answer to _check_meta's "rebuild the index" —
    change min_docs and/or prefix_len IN PLACE, source-free: the stored
    window rows carry every occurrence, so the duplication rule is
    re-derived from scratch under the new min_docs (hits and dup markers
    recomputed exactly as a from-zero ingest would), and every key space
    re-buckets under the new prefix_len. One atomic Pool.compact
    publish under the usual OCC claim (a concurrent sync aborts the
    rebuild, never splits the index across two contracts); cursors carry
    forward, the meta row is rewritten, and the returned spec is the
    new contract to sync/view with.

    `window` CANNOT change here: it is burned into the stored hashes
    (text is never stored) — changing it means re-ingesting the source
    into a fresh index, and asking for it raises."""
    # the CALLER's spec must be the index's CURRENT contract — otherwise
    # a rebuild run with an already-drifted YAML would bless the drifted
    # immutable window into the meta row, after which every sync
    # window-hashes deltas against incomparable stored hashes, silently
    # (review finding). _check_meta raises on mismatch.
    _check_meta(dest, spec)
    new_md = spec.min_docs if min_docs is None else int(min_docs)
    new_pl = spec.prefix_len if prefix_len is None else int(prefix_len)
    if not 1 <= new_pl <= 8:
        raise ValueError("prefix_len must be 1..8 hex chars")
    if new_md < 1:
        raise ValueError("min_docs must be >= 1")

    def _tx(df: DataFrame) -> DataFrame:
        if "h" not in df.columns or "pos" not in df.columns:
            raise ValueError(
                f"rebuild_spans: index {spec.name!r} has no stored windows")
        # fold tombstones/retractions FIRST: deleted docs' windows must
        # not enter the re-derivation, and retraction history is
        # consumed (the regenerated markers ARE the latest state)
        from zync_spark.streaming.tombstones import fold_tombstones

        df = fold_tombstones(df)
        wins = df.filter(_is(spec, "win")).select("h", "doc_id", "pos")
        satisfied = (
            wins.groupBy("h")
            .agg(F.count_distinct("doc_id").alias("nd"),
                 F.count(F.lit(1)).alias("nt"))
            .filter((F.col("nd") >= new_md) & (F.col("nt") >= 2))
            .select("h")
        )
        hits = wins.join(satisfied, "h").select("doc_id", "pos")
        # the forward key space regenerates from the stored wins — this
        # is also how LEGACY pools acquire delete support
        fwd = wins.select("doc_id", "h").distinct()
        meta = df.sparkSession.createDataFrame(
            [(spec.window, new_md, new_pl, 1)],
            "window long, min_docs long, prefix_len long, forward long")
        out = (
            _stamp("win", pmod_ckey("w:", F.col("h"), new_pl), wins)
            .unionByName(
                _stamp("hit", pmod_ckey("h:", F.col("doc_id"), new_pl),
                       hits), allowMissingColumns=True)
            .unionByName(
                _stamp("dup", pmod_ckey("d:", F.col("h"), new_pl),
                       satisfied), allowMissingColumns=True)
            .unionByName(
                _stamp("fwd", pmod_ckey("f:", F.col("doc_id"), new_pl),
                       fwd), allowMissingColumns=True)
            .unionByName(_stamp("meta", F.lit("c:"), meta),
                         allowMissingColumns=True)
        )
        # fresh labels on the reserved partition -2 (the rebuild_ann
        # convention): the base manifest is the only commit at its seq,
        # so labels cannot collide with any sync pass's rows
        out = out.select(
            F.struct(
                F.lit(spec.topic).alias("topic"),
                F.lit(-2).cast("long").alias("partition"),
                F.monotonically_increasing_id().alias("offset"),
            ).alias("kafka"),
            *[F.col(c) for c in out.columns],
        )
        # cursor tombstones and other topics sharing the pool pass
        # through untouched
        others = df.filter(~F.col("kafka.topic").eqNullSafe(spec.topic))
        return out.unionByName(others, allowMissingColumns=True)

    dest.compact(target_rows=target_rows, message=message, transform=_tx,
                 cluster_by=["ckey"])
    return SpanIndexSpec(spec.name, spec.id_expr, spec.text_expr,
                         window=spec.window, min_docs=new_md,
                         prefix_len=new_pl)


def compact_spans(dest: Pool, target_rows: int = 4_000_000,
                  message: str = "spanindex compact") -> int:
    """Range-cluster the pool by ckey so each output file covers a
    narrow bucket range — the probe and spans_view skip at FILE
    granularity. Fresh commits are already load-clustered; this folds
    small-file accretion on the usual cadence. Tombstones FOLD here:
    deleted docs' win/hit/fwd rows, retracted hits/dup markers, and the
    tombstone/retraction rows themselves all leave in the base rewrite
    (streaming.tombstones.fold_tombstones)."""
    from zync_spark.streaming.tombstones import fold_tombstones

    return dest.compact(target_rows=target_rows, message=message,
                        transform=fold_tombstones, cluster_by=["ckey"])


def spans_view(dest: Pool, spec: SpanIndexSpec,
               doc_ids: list[int] | None = None,
               stats_out: dict | None = None) -> DataFrame:
    """The accumulated duplicated spans: (doc_id, span_start, span_end,
    span_tokens), gaps-and-islands merged across commits — over any
    batch split this equals `duplicate_spans` over the full corpus.
    With `doc_ids`, reads only those documents' hit buckets
    (scan(bounds=) point-set skipping); without, reads the whole 'h:'
    key space (documents-with-spans sized, not window sized)."""
    _check_meta(dest, spec)
    plen = spec.prefix_len
    if doc_ids is not None:
        # point set: only the asked-for documents' hit buckets
        buckets = sorted({
            "h:" + format(d % (16 ** plen), f"0{plen}x") for d in doc_ids
        })
    else:
        # the whole 'h:' key space as ONE range bound ('g' > 'f' closes
        # the hex alphabet) — skips every w:/d: file, which is the bulk
        # of the pool (windows ~ tokens; hits ~ duplicated positions)
        buckets = ("h:", "h:g")
    if stats_out is not None:
        stats_out["live_files"] = len(dest.committed_files())
        stats_out["hit_files"] = len(
            dest.committed_files(bounds={"ckey": buckets}))
    spark = dest.spark
    empty = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long, span_tokens long")
    stored = dest.scan(bounds={"ckey": buckets})
    if stored is None or "pos" not in stored.columns:
        return empty
    # masking (streaming/tombstones): doc tombstones kill a deleted
    # doc's hits; 'unhit' retractions (same 'h:' buckets as the hits
    # they retract, so this read already has them) kill a surviving
    # doc's hits whose hash lost its duplication status to a delete
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    hits = mask_rows(stored.filter(_is(spec, "hit")),
                     read_tombs(dest, spec.topic), "doc_id")
    unhits = (stored.filter(_is(spec, "unhit"))
              .groupBy(F.col("doc_id").alias("__d"),
                       F.col("pos").alias("__p"))
              .agg(F.max("kafka.partition").alias("__u")))
    hits = (hits.join(F.broadcast(unhits),
                      (F.col("doc_id") == F.col("__d"))
                      & (F.col("pos") == F.col("__p")), "left")
            .filter(F.col("__u").isNull()
                    | (F.col("kafka.partition") >= F.col("__u")))
            .select("doc_id", "pos"))
    if doc_ids is not None:
        hits = hits.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
    # the SAME maximal-span definition as the batch operator — one
    # shared merge (functions.dedup.merge_islands), merging across
    # commits because the accumulated hits are merged together
    from zync_spark.functions.dedup import merge_islands

    spans = merge_islands(hits, spec.window)
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    )


def load_span_spec(path: str) -> tuple[SpanIndexSpec, dict]:
    """Parse a span-index spec YAML; returns (spec, raw_doc) — the doc
    carries routing fields (source/dest/topics). `kind: span` is
    REQUIRED (the same dispatch-disambiguation contract as the text
    index's `kind: text`).

    Spec YAML:
      kind: span        # required discriminator
      name: docs
      source: src_pool
      dest: index_pool
      topics: [docs]
      id: value.doc_id
      text: value.text
      window: 8         # optional
      min_docs: 2       # optional
      prefix_len: 2     # optional — size to the DELTA, see module note
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if doc.get("kind") != "span":
        raise ValueError(
            f"{path}: span-index specs must declare 'kind: span' (shared "
            "spec fields would otherwise let a YAML parse as the wrong "
            "index family in from-kafka --index dispatch)")
    spec = SpanIndexSpec(
        doc["name"],
        id_expr=doc["id"],
        text_expr=doc["text"],
        window=int(doc.get("window", 8)),
        min_docs=int(doc.get("min_docs", 2)),
        prefix_len=int(doc.get("prefix_len", _PREFIX_LEN)),
    )
    return spec, doc
