"""Incrementally maintained BM25 text-search index over a document pool
— the third pool-backed index family (MinHash-LSH dedup:
streaming/dedup_index.py, IVF ANN: streaming/ann_index.py), built for
the corpus-exploration and targeted-retrieval passes a training-data
pipeline runs constantly (find documents matching a probe query, audit
what matched a filter, pull candidates for decontamination review).

Storage model (one pool, three ckey-bucketed key spaces — every read is
file-skippable via scan(bounds=), the same contract as the other two
indexes):

- `post` rows (term, doc_id, tf), ckey 't:<first hex chars of
  md5(term)>': a term's postings all live in one bucket, so a query
  reads ONLY its terms' buckets — the inverted-file contract in pool
  form. tf is exact (per-delta groupBy of the delta only).
- `dlen` rows (doc_id, dl), ckey 'd:<pmod(doc_id) hex>': document
  lengths, fetched boundedly for just the candidate docs.
- `cstat` rows (n_docs, dl_sum), ckey 'c:': per-commit corpus-stat
  PARTIALS — summing them reconstructs N and avg-doclen exactly
  (mergeable partials, the incremental-rollup trick), so no pass ever
  rescans the corpus for its size.

Each maintenance pass costs O(new documents): cursor-bounded delta scan
(streaming/incremental.py), map-side tokenization (whitespace, the
shared text.tokens contract), one delta-only groupBy for tfs, and ONE
atomic ckey-clustered commit with advanced cursors (Pool.load
cluster_by= + occ_token=) — crash-safe, rerun = no-op. Because postings
are append-only per (doc, term) under cursor bounding, the incremental
index over ANY batch split answers queries IDENTICALLY to a batch BM25
over the full corpus — differential-tested, and hash-checked against a
DuckDB oracle that replays the whole computation in SQL.

Scoring is BM25 (k1=1.2, b=0.75) with the idf quantized to integer
micro-nats before the per-term products (the text_ppl_unigram
determinism recipe): per-(doc, term) partials floor to longs, so the
per-doc sum is exact and order-independent — cross-engine hash-stable.

Updates/deletes (round 6): `tombstone_text` deletes documents from the
LATEST state in O(deleted docs' buckets) — a tombstone row per id masks
its post/dlen rows by commit-seq comparison (streaming/tombstones.py)
and a NEGATIVE cstat partial keeps the mergeable corpus stats exact.
The CDC update flow is tombstone FIRST, then re-publish under the same
doc_id at a new offset and sync — the new posting set is live (written
after the tombstone), every older one is masked, and search_text
answers identically to a fresh index over the latest corpus
(differential-tested, catalog-oracled). compact_text/rebuild_text fold
masked rows physically.

Reference parity: the reference has no search surface (this module is
beyond-reference); the commit/cursor machinery mirrors its done-marker
design (README.md:447-455).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zync_spark.functions import text as TX
from zync_spark.pool import Pool
from zync_spark.streaming.dedup_index import _envelope, _stamp
from zync_spark.streaming.incremental import _spec_cursors, scan_delta

_PREFIX_LEN = 2  # 16^2 = 256 buckets per key space; see dedup_index's note

# BM25 constants — written as the EXACT literals both engines evaluate
# (0.25 = 1-b, 2.2 = k1+1: spelled as literals, NOT computed — float(1.2)+1.0
# and float("2.2") could differ in the last ulp), so the double
# expression trees match token for token
_K1 = 1.2
_B = 0.75
_K1P1 = 2.2
_ONE_MINUS_B = 0.25


def _term_ckey(term, prefix_len: int = _PREFIX_LEN) -> F.Column:
    """'t:' + md5(term) prefix — md5 hex is uniform and both engines
    (F.md5 / hashlib) agree byte-for-byte, so write-side bucketing and
    python-side probe values can never drift."""
    return F.concat(F.lit("t:"), F.substring(F.md5(term), 1, prefix_len))


def _dl_ckey(doc_id, prefix_len: int = _PREFIX_LEN) -> F.Column:
    """'d:' + pmod bucket of doc_id — the shared bucketing expression
    (dedup_index.pmod_ckey), one definition across all index families."""
    from zync_spark.streaming.dedup_index import pmod_ckey

    return pmod_ckey("d:", doc_id, prefix_len)


class TextIndexSpec:
    """Declarative index definition. `id_expr`/`text_expr`: SQL
    expressions over the source pool's rows producing the document id
    (long) and text.

    `attrs` (round 7, metadata co-location): {attr name: SQL expr over
    source rows} — narrow filterable attributes (lang, source, date)
    the sync stores as index-RESIDENT 'attr' rows in their own 'a:'
    key space, values cast to string in a map column (mergeable across
    co-tenant schemas). `attr_ids(dest, spec, predicate)` then resolves
    a retrieval filter from the index pool ALONE — at 100 TB the
    alternative is re-scanning the source corpus's metadata on every
    `retrieve --where`."""

    def __init__(self, name: str, id_expr: str, text_expr: str,
                 prefix_len: int = _PREFIX_LEN,
                 attrs: dict[str, str] | None = None):
        if not 1 <= prefix_len <= 8:
            raise ValueError("prefix_len must be 1..8 hex chars")
        self.name = name
        self.topic = f"textindex:{name}"
        self.id_expr = id_expr
        self.text_expr = text_expr
        self.prefix_len = prefix_len
        self.attrs = dict(attrs) if attrs else {}

    # duck-types RollupSpec for _spec_cursors' key namespace
    @property
    def keys(self):  # pragma: no cover - structural only
        return {"doc_id": self.id_expr}


def _is(spec: TextIndexSpec, zed_type: str):
    return (F.col("zed_type").eqNullSafe(zed_type)
            & F.col("kafka.topic").eqNullSafe(spec.topic))


def _check_meta(dest: Pool, spec: TextIndexSpec) -> bool:
    """Validate the caller's prefix_len against the contract persisted
    at index creation; returns whether a meta row exists (sync writes
    one when it doesn't — legacy pools acquire theirs on the next
    pass). prefix_len is baked into stored term/doc ckeys: a drifted
    spec would not error — search would probe past stored posting
    buckets and silently miss results. Rides the 'c:' bucket the
    corpus stats already live in."""
    if not dest.commits():
        return False
    df = dest.scan(bounds={"ckey": ["c:"]})
    rows = []
    if df is not None and "prefix_len" in df.columns:
        rows = (df.filter(_is(spec, "meta"))
                .select("prefix_len").limit(1).collect())
    if not rows:
        # pre-meta (legacy) pool: bootstrap-validate prefix_len against
        # the width of any stored bucketed ckey so the first
        # post-upgrade sync cannot bless a drifted fan-out as the
        # creation contract (review finding)
        full = dest.scan()
        if full is not None and "ckey" in full.columns:
            sample = (full.filter(
                F.col("kafka.topic").eqNullSafe(spec.topic)
                & F.col("ckey").isNotNull() & (F.col("ckey") != "c:"))
                .select("ckey").limit(1).collect())
            if sample and len(sample[0]["ckey"]) - 2 != spec.prefix_len:
                raise ValueError(
                    f"text index {spec.name!r}: stored ckeys are "
                    f"{len(sample[0]['ckey']) - 2} hex chars wide but the "
                    f"spec says prefix_len={spec.prefix_len} — fixed for "
                    "the life of an index; rebuild the index to change it")
        return False
    stored = int(rows[0]["prefix_len"])
    if stored != spec.prefix_len:
        raise ValueError(
            f"text index {spec.name!r} was created with prefix_len="
            f"{stored} but the spec now says {spec.prefix_len} — fixed "
            "for the life of an index (stored ckeys embed it); rebuild "
            "the index to change it")
    return True


def sync_text(src: Pool, dest: Pool, spec: TextIndexSpec,
              topics: list[str], message: str | None = None,
              auto_compact_every: int | None = None,
              upsert: bool = False) -> int:
    """One incremental maintenance pass; returns rows appended (post +
    dlen + cstat; 0 = no new documents, reruns are no-ops).
    `auto_compact_every`: re-cluster (compact_text) after that many
    delta commits since the last base — same cadence contract as the
    other index maintainers; single-writer maintenance only.

    `upsert=True` (one-call CDC): every delta doc_id's previous posting
    set is tombstoned in the SAME atomic commit, with the matching
    NEGATIVE cstat partial (one bounded 'd:' bucket read of just the
    delta ids) so corpus stats stay exact — re-published documents
    replace their old version instead of double-counting tf/df.
    Within-batch duplicates collapse to the latest offset first."""
    n = _sync_text_once(src, dest, spec, topics, message, upsert=upsert)
    if (n and auto_compact_every
            and dest.commits_since_base() >= auto_compact_every):
        compact_text(dest)
    return n


def _sync_text_once(src: Pool, dest: Pool, spec: TextIndexSpec,
                    topics: list[str], message: str | None,
                    upsert: bool = False) -> int:
    snapshot = len(dest.commits())
    cursors = _spec_cursors(spec, dest.stored_cursors(), topics)
    delta = scan_delta(src, cursors, topics)
    if delta is None:
        return 0
    delta = delta.persist()
    tokenized = None
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
        has_meta = _check_meta(dest, spec)
        src_rows = delta
        tombs_new = None
        if upsert:
            from zync_spark.streaming.tombstones import keep_latest_versions

            src_rows = keep_latest_versions(delta, spec.id_expr)
            tombs_new = src_rows.select(
                F.expr(spec.id_expr).cast("long").alias("did")).distinct()
        # ensure_compute_splits BEFORE tokenization (round-11 audit):
        # the delta's packed read lands small batches in one partition —
        # right for IO, single-task for the regex tokenize that feeds
        # BOTH the postings and dlen branches; an already-parallel
        # delta skips the reshuffle
        from zync_spark.functions.compute import ensure_compute_splits

        # fenced (round 11, the vector-sync finding): `docs` feeds THREE
        # union branches (posts, dlens, cstat) and the commit's load
        # materializes the union TWICE (count job + write) — uncached,
        # the regex tokenize ran up to six times per sync. The cache is
        # delta-sized (doc_id + token array), same scale as the delta
        # already persisted above.
        # the empty-doc drop sits ABOVE the persist (round 12): a filter
        # on the toks alias below it would sink past the projection by
        # re-substituting the regex tokenize into a pushed filter (the
        # _shingle_sets finding) — above the cache it reads the cached
        # arrays instead. The cache holds the few empty-token docs too;
        # every consumer filters through `docs` below.
        docs = ensure_compute_splits(src_rows.select(
            F.expr(spec.id_expr).cast("long").alias("doc_id"),
            F.lower(F.expr(spec.text_expr)).alias("__text"),
        )).select(
            "doc_id", TX.tokens(F.col("__text")).alias("toks"),
        ).persist()
        tokenized = docs  # the cached frame — unpersisted in finally
        docs = docs.filter(F.size("toks") > 0)
        toks = docs.select(
            "doc_id", F.explode("toks").alias("term")
        ).filter(F.col("term") != "")
        posts = toks.groupBy("term", "doc_id").agg(
            F.count("*").cast("long").alias("tf"))
        dlens = docs.select(
            "doc_id", F.size("toks").cast("long").alias("dl"))
        cstat = dlens.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("dl_sum"))
        out = (
            _stamp("post", _term_ckey(F.col("term"), spec.prefix_len), posts)
            .unionByName(
                _stamp("dlen", _dl_ckey(F.col("doc_id"), spec.prefix_len),
                       dlens), allowMissingColumns=True)
            .unionByName(_stamp("cstat", F.lit("c:"), cstat),
                         allowMissingColumns=True)
        )
        if spec.attrs:
            # index-resident metadata: one 'attr' row per delta doc in
            # the shared 'a:' key space (streaming/attrs.py — ONE
            # implementation for every family since round 8) — retrieval
            # filters resolve from the index pool alone (attr_ids),
            # never the source corpus. Derived from src_rows, NOT the
            # tokenizable `docs` subset: an empty-text doc can still
            # live in the ANN index, and an attr filter must not
            # silently exclude it from that leg (round-7 review).
            from zync_spark.streaming.attrs import attr_rows

            out = out.unionByName(attr_rows(spec, src_rows),
                                  allowMissingColumns=True)
        if tombs_new is not None:
            from zync_spark.streaming.tombstones import read_tombs, tomb_rows

            out = out.unionByName(
                tomb_rows(delta.sparkSession, tombs_new, upto=snapshot,
                          prefix_len=spec.prefix_len),
                allowMissingColumns=True)
            # negative cstat partial for the superseded versions' live
            # dlen rows — the SAME helper the delete verb uses
            neg = _neg_cstat(dest, spec, tombs_new,
                             read_tombs(dest, spec.topic))
            if neg is not None:
                out = out.unionByName(neg, allowMissingColumns=True)
        if not has_meta:
            # persist the creation-time prefix_len so a later sync or
            # search under a drifted spec fails loud (_check_meta)
            meta = delta.sparkSession.createDataFrame(
                [(spec.prefix_len,)], "prefix_len long")
            out = out.unionByName(_stamp("meta", F.lit("c:"), meta),
                                  allowMissingColumns=True)
        n = dest.load(_envelope(spec, out, snapshot),
                      message or f"{spec.topic} sync",
                      cursors=new_cursors, occ_token=snapshot,
                      cluster_by=["ckey"])
        if n == 0:
            # delta had rows but none tokenizable: cursor tombstone,
            # same rationale as the dedup index
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
        if tokenized is not None:
            tokenized.unpersist()


def _neg_cstat(dest: Pool, spec: TextIndexSpec, idf: DataFrame,
               tombs: DataFrame | None) -> DataFrame | None:
    """The negative corpus-stat partial for the LIVE dlen rows of the
    ids in `idf` (did long), masked by `tombs` — ONE definition shared
    by tombstone_text and the upsert sync (round-6 review: the two
    paths must never diverge on what gets subtracted). One bounded 'd:'
    bucket read; None when the ids own no live length rows (absent or
    already-deleted ids subtract exactly nothing — idempotent)."""
    from zync_spark.streaming.tombstones import id_buckets, mask_rows

    dbuckets = id_buckets(idf, "d:", spec.prefix_len)
    stored = dest.scan(bounds={"ckey": dbuckets})
    if stored is None or "dl" not in stored.columns:
        return None
    live = mask_rows(
        stored.filter(_is(spec, "dlen"))
        .join(idf.withColumnRenamed("did", "doc_id"), "doc_id",
              "left_semi"),
        tombs, "doc_id")
    row = live.agg(F.count("*").cast("long").alias("n"),
                   F.sum("dl").cast("long").alias("s")).collect()[0]
    if int(row["n"] or 0) == 0:
        return None
    neg = dest.spark.createDataFrame(
        [(-int(row["n"]), -int(row["s"]))], "n_docs long, dl_sum long")
    return _stamp("cstat", F.lit("c:"), neg)


def tombstone_text(dest: Pool, spec: TextIndexSpec, ids) -> int:
    """Delete documents from the index's LATEST state — O(deleted docs'
    buckets), never a corpus scan: one atomic commit carrying (a) a
    tombstone row per id (zed_type 'tomb', ckey 'x:<pmod(id)>', upto =
    this pass's commit seq) that masks every post/dlen row committed
    before it, and (b) a NEGATIVE cstat partial (-n_live, -sum dl) so
    the mergeable corpus stats stay exact without rescanning anything —
    negative partials are partials (the incremental-rollup trick run
    backwards). The live doc-lengths come from one bounded 'd:' bucket
    read of just the target ids, already masked by any earlier
    tombstones, so deleting an absent or already-deleted id subtracts
    exactly nothing (idempotent).

    UPDATE flow (CDC): tombstone FIRST, then publish the new version to
    the source and sync_text. search_text masks at query time;
    compact_text/rebuild_text fold masked rows physically. Returns rows
    committed."""
    from zync_spark.streaming.tombstones import (commit_with_retry,
                                                 ids_frame, read_tombs,
                                                 tomb_rows)

    _check_meta(dest, spec)
    idf = ids_frame(dest.spark, ids).persist()

    def build(seq: int) -> DataFrame:
        out = tomb_rows(dest.spark, idf, upto=seq,
                        prefix_len=spec.prefix_len)
        neg = _neg_cstat(dest, spec, idf, read_tombs(dest, spec.topic))
        if neg is not None:
            out = out.unionByName(neg, allowMissingColumns=True)
        return _envelope(spec, out, seq)

    try:
        return commit_with_retry(dest, build, f"{spec.topic} tombstone")
    finally:
        idf.unpersist()


def compact_text(dest: Pool, target_rows: int = 4_000_000,
                 message: str = "textindex compact") -> int:
    """Range-cluster the index pool by ckey so each output file covers a
    narrow term/doc bucket range — search reads only its terms' buckets
    at FILE granularity. Fresh commits are already load-clustered; this
    folds the small-file accretion on the usual cadence. (No spec
    parameter, unlike compact_index: there is no legacy layout to
    self-heal and ckeys carry no spec-dependent width here — term
    buckets are md5 prefixes whose stored length IS the truth.)
    Tombstones FOLD here: masked post/dlen rows and the tombstone rows
    leave together in the base rewrite; the negative cstat partials
    persist (they ARE the corrected stats — mergeable partials)."""
    from zync_spark.streaming.tombstones import fold_tombstones

    return dest.compact(target_rows=target_rows, message=message,
                        transform=fold_tombstones, cluster_by=["ckey"])


def rebuild_text(dest: Pool, spec: TextIndexSpec,
                 prefix_len: int,
                 target_rows: int = 4_000_000,
                 message: str = "textindex rebuild") -> TextIndexSpec:
    """The executable answer to _check_meta's "rebuild the index" —
    change prefix_len IN PLACE, source-free: stored posting rows carry
    the term and dlen rows the doc_id, so every key space re-buckets
    under the new fan-out in one atomic Pool.compact publish (OCC claim;
    a concurrent sync aborts the rebuild). Cursors carry forward; the
    meta row is rewritten; the returned spec is the new contract."""
    if not 1 <= int(prefix_len) <= 8:
        raise ValueError("prefix_len must be 1..8 hex chars")
    # the CALLER's spec must be the index's CURRENT contract (review
    # finding — same rationale as rebuild_spans/rebuild_index)
    _check_meta(dest, spec)
    new_pl = int(prefix_len)

    def _tx(df: DataFrame) -> DataFrame:
        if "term" not in df.columns:
            raise ValueError(
                f"rebuild_text: index {spec.name!r} has no stored postings")
        # fold tombstones FIRST: masked rows must not re-bucket into the
        # rebuilt index, and the topic's tomb rows must not be silently
        # dropped un-applied by the type filters below
        from zync_spark.streaming.tombstones import fold_tombstones

        df = fold_tombstones(df)
        mine = df.filter(F.col("kafka.topic").eqNullSafe(spec.topic))
        posts = mine.filter(F.col("zed_type").eqNullSafe("post")) \
            .select("kafka", "term", "doc_id", "tf")
        dlens = mine.filter(F.col("zed_type").eqNullSafe("dlen")) \
            .select("kafka", "doc_id", "dl")
        cstat = mine.filter(F.col("zed_type").eqNullSafe("cstat")) \
            .select("kafka", "n_docs", "dl_sum")
        meta = df.sparkSession.createDataFrame(
            [(new_pl,)], "prefix_len long")
        out = (
            posts.select(
                "kafka", F.lit("post").alias("zed_type"),
                _term_ckey(F.col("term"), new_pl).alias("ckey"),
                "term", "doc_id", "tf")
            .unionByName(dlens.select(
                "kafka", F.lit("dlen").alias("zed_type"),
                _dl_ckey(F.col("doc_id"), new_pl).alias("ckey"),
                "doc_id", "dl"), allowMissingColumns=True)
            .unionByName(cstat.select(
                "kafka", F.lit("cstat").alias("zed_type"),
                F.lit("c:").alias("ckey"), "n_docs", "dl_sum"),
                allowMissingColumns=True)
            .unionByName(meta.select(
                F.struct(
                    F.lit(spec.topic).alias("topic"),
                    F.lit(-2).cast("long").alias("partition"),
                    F.monotonically_increasing_id().alias("offset"),
                ).alias("kafka"),
                F.lit("meta").alias("zed_type"),
                F.lit("c:").alias("ckey"), "prefix_len"),
                allowMissingColumns=True)
        )
        if "attrs" in df.columns:
            # co-located metadata survives the rebuild: attr rows
            # re-bucket under the new fan-out like every other key
            # space (round-7 review — dropping them would kill
            # attr-filtered retrieval until a full re-sync, and the
            # auto-rebuild path would do it silently)
            from zync_spark.streaming.dedup_index import pmod_ckey

            attrs = mine.filter(F.col("zed_type").eqNullSafe("attr")) \
                .select("kafka", "doc_id", "attrs")
            out = out.unionByName(attrs.select(
                "kafka", F.lit("attr").alias("zed_type"),
                pmod_ckey("a:", F.col("doc_id"), new_pl).alias("ckey"),
                "doc_id", "attrs"), allowMissingColumns=True)
        others = df.filter(~F.col("kafka.topic").eqNullSafe(spec.topic))
        return out.unionByName(others, allowMissingColumns=True)

    dest.compact(target_rows=target_rows, message=message, transform=_tx,
                 cluster_by=["ckey"])
    return TextIndexSpec(spec.name, id_expr=spec.id_expr,
                         text_expr=spec.text_expr, prefix_len=new_pl,
                         attrs=spec.attrs)


def corpus_stats(dest: Pool, spec: TextIndexSpec) -> tuple[int, int]:
    """(n_docs, dl_sum) from the mergeable cstat partials — one bounded
    bucket read, never a corpus scan."""
    df = dest.scan(bounds={"ckey": ["c:"]})
    if df is None or "n_docs" not in df.columns:
        return 0, 0
    row = (df.filter(_is(spec, "cstat"))
           .agg(F.sum("n_docs").alias("n"), F.sum("dl_sum").alias("s"))
           .collect()[0])
    return int(row["n"] or 0), int(row["s"] or 0)


def search_text(dest: Pool, spec: TextIndexSpec, query: str | list[str],
                k: int = 10, stats_out: dict | None = None,
                where_ids: DataFrame | None = None) -> DataFrame:
    """BM25 top-k over the stored index: (doc_id, rank, score) with
    score in integer micro-nat-scaled units (exact long — hash-stable).

    Reads ONLY the query terms' posting buckets, the candidate docs'
    dlen buckets, and the 'c:' stat bucket (`scan(bounds=)` point-set
    skipping; `stats_out` receives live_files/probe_files/dlen_files —
    the boundedness contract under test). Duplicate query terms count
    once (standard bag-of-words query semantics).

    `where_ids` (filtered retrieval): a frame whose FIRST column is the
    allowed doc ids (e.g. `metadata.filter(pred).select(id)` — the
    predicate pushes down to the metadata scan). Candidates are
    restricted AFTER the posting intersection — EXACT for BM25, since a
    filtered-out doc without the query terms scores 0 anyway — and the
    dlen fetch then reads only the surviving candidates' buckets, so
    probe cost stays bounded. df/N/avgdl stay CORPUS-level (the standard
    filtered-retrieval contract: rerank within the filter using the
    global model; the SQL oracle mirrors this). The semi-join's big
    side is the filter scan; AQE broadcasts whichever side is small."""
    _check_meta(dest, spec)
    if isinstance(query, str):
        terms = query.lower().split()  # the text.tokens contract
    else:
        terms = [t.lower() for t in query]
    terms = sorted({t for t in terms if t})
    if not terms:
        raise ValueError("search_text: empty query")
    buckets = sorted({
        "t:" + hashlib.md5(t.encode()).hexdigest()[:spec.prefix_len]
        for t in terms
    })
    if stats_out is not None:
        stats_out["live_files"] = len(dest.committed_files())
        stats_out["probe_files"] = len(
            dest.committed_files(bounds={"ckey": buckets}))
    stored = dest.scan(bounds={"ckey": buckets})
    spark = dest.spark
    empty = spark.createDataFrame([], "doc_id long, rank long, score long")
    if stored is None or "term" not in stored.columns:
        return empty
    # mask deleted documents BEFORE df/idf are computed: a dead doc in
    # the postings would inflate every term's document frequency, not
    # just leak into the candidates (one bounded 'x:' read, O(deletes))
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    tombs = read_tombs(dest, spec.topic)
    posts = mask_rows(
        stored.filter(_is(spec, "post") & F.col("term").isin(terms)),
        tombs, "doc_id").select("term", "doc_id", "tf")
    n_docs, dl_sum = corpus_stats(dest, spec)
    if n_docs == 0:
        return empty
    # document-frequency per term: postings are unique per (doc, term)
    # by construction, so a count IS the df — computed BEFORE the
    # where_ids restriction (corpus-level stats, see docstring)
    dfreq = posts.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if where_ids is not None:
        from zync_spark.streaming.tombstones import allowed_ids

        posts = posts.join(allowed_ids(where_ids, "doc_id"),
                           "doc_id", "left_semi")
    # candidate docs' length buckets — a <=256-value metadata collect
    # bounding the dlen fetch, same shape as the dedup index's set fetch
    dbuckets = sorted(
        r["ck"] for r in posts
        .select(_dl_ckey(F.col("doc_id"), spec.prefix_len).alias("ck"))
        .distinct().collect()
    )
    if not dbuckets:
        return empty
    if stats_out is not None:
        stats_out["dlen_files"] = len(
            dest.committed_files(bounds={"ckey": dbuckets}))
    dl_df = mask_rows(
        dest.scan(bounds={"ckey": dbuckets}).filter(_is(spec, "dlen")),
        tombs, "doc_id").select("doc_id", "dl")
    # BM25 with idf quantized to integer micro-nats BEFORE the per-term
    # product, and the product floored to a long — the per-doc sum is
    # then exact and order-independent (text_ppl_unigram recipe). The
    # double expression tree below is mirrored token-for-token in the
    # SQL oracle, so the floors land identically.
    idf = dfreq.select(
        "term",
        F.floor(F.log(
            (F.lit(n_docs) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
        ) * 1000000).cast("long").alias("idf_unats"),
    )
    parts = (
        posts.join(idf, "term").join(dl_df, "doc_id")
        .select(
            "doc_id",
            F.floor(
                F.col("idf_unats") * (F.col("tf") * F.lit(_K1P1))
                / (F.col("tf") + F.lit(_K1) * (
                    F.lit(_ONE_MINUS_B)
                    + F.lit(_B) * (F.col("dl") * F.lit(n_docs)
                                   / F.lit(dl_sum))))
            ).cast("long").alias("part"),
        )
    )
    scored = parts.groupBy("doc_id").agg(F.sum("part").alias("score"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "score"))


def load_text_spec(path: str) -> tuple[TextIndexSpec, dict]:
    """Parse a text-index spec YAML (the CLI's format); returns
    (spec, raw_doc) — the doc carries routing fields (source/dest/topics).

    `kind: text` is REQUIRED: a text spec's other fields are a strict
    subset of the dedup-index spec's, so without the discriminator a
    text YAML handed to `from-kafka --index` would silently parse as a
    DedupIndexSpec and maintain the WRONG index into the dest pool
    (round-5 review finding) — the field makes every dispatcher
    unambiguous and mistakes loud.

    Spec YAML:
      kind: text        # required discriminator
      name: docs
      source: src_pool
      dest: index_pool
      topics: [docs]
      id: value.doc_id
      text: value.text
      prefix_len: 2     # optional
      attrs:            # optional: index-resident metadata for
        lang: value.lang    # retrieve --where (round 7) — filters
        source: value.source  # resolve from the index pool alone
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    if doc.get("kind") != "text":
        raise ValueError(
            f"{path}: text-index specs must declare 'kind: text' (its "
            "other fields are a subset of the dedup-index spec's, so the "
            "discriminator is what keeps from-kafka --index dispatch "
            "unambiguous)")
    spec = TextIndexSpec(
        doc["name"],
        id_expr=doc["id"],
        text_expr=doc["text"],
        prefix_len=int(doc.get("prefix_len", _PREFIX_LEN)),
        attrs=doc.get("attrs"),
    )
    return spec, doc


# Re-exported for round-7 callers; the one definition lives in
# streaming/attrs.py (spec-agnostic since round 8).
from zync_spark.streaming.attrs import ATTR_BOUNDS  # noqa: E402,F401


def attr_ids(dest: Pool, spec: TextIndexSpec, predicate: str) -> DataFrame:
    """Resolve a metadata filter from the INDEX pool alone (round 7) —
    the text-family wrapper over the shared implementation
    (streaming/attrs.py, spec-agnostic since round 8): the coverage
    guard enumerates live indexed docs from the 'd:' dlen space, so an
    index synced before the spec declared attrs fails LOUD instead of
    silently excluding pre-attrs docs from retrieval. Semantics (latest
    version per doc wins, tombstone masking, EmptyIndexError fallback
    contract) documented on attrs.attr_ids."""
    from zync_spark.streaming import attrs as A
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    live = None
    full = dest.scan(bounds={"ckey": ("d:", "d:g")})
    if full is not None and "dl" in full.columns:
        live = mask_rows(full.filter(_is(spec, "dlen")),
                         read_tombs(dest, spec.topic),
                         "doc_id").select("doc_id")
    return A.attr_ids(dest, spec, predicate, live_ids=live)
