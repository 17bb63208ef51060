"""Pool: an append-only, offset-keyed lake table over parquet files with
atomic commits — the Spark-side analog of the reference's Zed lake pool
(etl/pool.go, fifo/lake.go).

Commit protocol (a minimal transaction log, Delta-style):
  pool_dir/
    pool.json              # config: {"key": "kafka.offset", "order": "asc"}
    data/<uuid>.parquet    # immutable data files (written first)
    _commits/<n>.json      # manifest per commit: {"files": [...], "message": ...}

A commit is visible iff its manifest exists; manifests are PUBLISHED with
write-to-temp + atomic EXCLUSIVE link (os.link fails on an existing
name), so readers never see partial commits, a crashed writer leaves only
orphaned data files (never a torn table), and two writers can never both
claim one commit sequence number — optimistic concurrency control, the
same protocol Delta uses against a transaction log. A losing load()
retries at the next sequence number (its data files are independent); a
losing compact() aborts with ConcurrentWriteError (its base manifest
would supersede a commit it never read — the caller just re-runs). This
goes beyond the reference, which assumes a single writer per pool
(README.md:150-151) and offers transactionality only through the lake
server (etl/pool.go:56-58).

Scale note: reads hand Spark the committed file list directly — partition
pruning / predicate pushdown work as with any parquet scan, and because
pools are offset-sorted at write time, min/max row-group stats give the
range-pruned scans the reference only planned (etl/build.go:9-18).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PoolKeyError(ValueError):
    """Pool exists but its key is not kafka.offset ascending
    (mirrors the reference's pool-open check, etl/pool.go:37-40)."""


class ConcurrentWriteError(RuntimeError):
    """Another writer committed while this operation ran and the operation
    cannot be transparently retried (compaction); re-run it."""


class Pool:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str, key: str = "kafka.offset",
               order: str = "asc") -> "Pool":
        # enforce the same invariant open() checks: accepting another key
        # here would create a pool that writes fine but can never be
        # reopened (and load() sorts by kafka.offset regardless)
        if key != "kafka.offset" or order != "asc":
            raise PoolKeyError(
                f"pools require key kafka.offset in ascending order, got "
                f"key={key!r} order={order!r} (etl/pool.go:37-40)"
            )
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "_commits"), exist_ok=True)
        cfg = os.path.join(path, "pool.json")
        if not os.path.exists(cfg):
            _atomic_write_json(cfg, {"key": key, "order": order})
        return cls(spark, path)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "Pool":
        cfg_path = os.path.join(path, "pool.json")
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(f"not a pool: {path}")
        with open(cfg_path) as f:
            cfg = json.load(f)
        if cfg.get("key") != "kafka.offset" or cfg.get("order", "asc") != "asc":
            raise PoolKeyError(
                f"pool {path} must have key kafka.offset in ascending order, "
                f"got {cfg}"
            )
        return cls(spark, path)

    # -- commit log --------------------------------------------------------

    def _commit_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def commits(self) -> list[str]:
        d = self._commit_dir()
        if not os.path.isdir(d):
            return []
        # numeric sort: lexicographic order of %06d names silently breaks
        # at seq 1,000,000 (~46 days of 5-second streaming commits), and
        # every ordering-dependent reader (base supersede, at=, cursor
        # last-wins) would go quietly wrong
        return sorted(
            (f for f in os.listdir(d) if f.endswith(".json")),
            key=lambda f: int(f.split(".")[0]),
        )

    def committed_files(self, lower_bounds: dict[str, int] | None = None,
                        at: int | None = None,
                        bounds: dict[str, tuple] | None = None) -> list[str]:
        """Committed data files, optionally pruned by manifest offset stats.

        `lower_bounds` declares the caller's read contract: it will only
        look at rows whose kafka.topic is a key of the dict with
        kafka.offset >= its bound. A commit is skipped when no bounded
        topic can still have qualifying rows (its per-topic max offset is
        below the bound, or the topic is absent). Commits without stats
        (foreign manifests) are always kept. This is the range-limited
        scan the reference planned but never built (etl/build.go:9-18):
        incremental ETL cost goes with NEW data, not pool size.

        A bound VALUE may also be a dict {partition: offset} (Kafka
        offsets are per-partition sequences): the commit is kept if any
        of its per-partition stats ("t#p" keys) can still qualify, with
        unseen partitions defaulting to bound 0 (a new partition's rows
        must never be pruned). Commits whose manifests predate the
        per-partition stats cannot be partition-pruned and are kept
        whenever they contain the topic at all.

        `at` (commit sequence number) reads the table as of that commit —
        time travel over the manifest log. A `base` manifest (written by
        compact()) supersedes everything before it, so the live view is
        "last base + later deltas", like a Delta checkpoint.

        `bounds` prunes at FILE granularity using per-file column min/max
        recorded by `compact(cluster_by=...)`: a file is skipped when, for
        any bounded column, its recorded [min,max] cannot overlap the
        requested bound. A bound is either a `(lo, hi)` range tuple or a
        LIST of admissible values (point-set skipping: the file is kept
        iff some value falls inside its [min,max] — the `IN`-predicate
        analog of range skipping, what a bucketed probe needs). Files
        without recorded stats are always kept, and the caller MUST still
        apply the row-level filter — this is multi-dimensional data
        skipping (Z-order-style), not a filter.
        """
        files: list[str] = []
        fstats: dict[str, dict] = {}
        for c in self.commits():
            if at is not None and int(c.split(".")[0]) > at:
                break
            with open(os.path.join(self._commit_dir(), c)) as f:
                manifest = json.load(f)
            if manifest.get("base"):
                files = []  # compaction checkpoint: replaces prior commits
            # falsy {} means "no bounds declared" (a dynamically-built
            # empty dict must not prune everything), same as None
            if lower_bounds:
                stats = manifest.get("stats")
                if stats is not None and not _bounds_keep(stats, lower_bounds):
                    continue
            files.extend(manifest["files"])
            fstats.update(manifest.get("col_stats") or {})
        if bounds:
            files = [f for f in files if _may_overlap(fstats.get(f), bounds)]
        return files

    def seq_at_ts(self, ts: float) -> int | None:
        """Resolve a wall-clock timestamp to the last commit sequence at or
        before it (timestamp-based time travel, the lakehouse-standard
        companion to `at=<seq>`). Commits without a `ts` field (pre-feature
        manifests) count as arbitrarily old. None = nothing committed yet."""
        last = None
        for c in self.commits():
            with open(os.path.join(self._commit_dir(), c)) as f:
                if json.load(f).get("ts", 0.0) > ts:
                    break
            last = int(c.split(".")[0])
        return last

    # -- named-type registry (sidecar) ------------------------------------

    def type_names(self) -> dict[str, str]:
        """Named-type decorations by dotted column path — the per-pool
        sidecar registry carrying zed's NESTED named types, which the
        unified Spark schema cannot hold per-value (SURVEY §1.2; the
        reference nests them freely, connectjson/connectjson_test.go:22-23,
        etl/pipeline.go:106). Top-level tags ride the zed_type column;
        this registry covers every deeper path. Decorations describe the
        pool's unified schema, not per-row state — appropriate because a
        pool's rows of one zed_type share a shape by construction."""
        p = os.path.join(self.path, "types.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def set_type_names(self, names: dict[str, str]) -> None:
        """Merge decorations into the sidecar (atomic rewrite). Last
        writer wins per path — same semantics as the zed type context
        rebinding a name.

        The read-merge-write runs under an exclusive flock so two
        concurrent writers cannot interleave (each would otherwise
        rewrite from its own stale read and drop the other's paths —
        round-4 review finding). flock is the right primitive here
        (round-6 review): the kernel releases it automatically when the
        holder's fd closes — including on a CRASH — so there is no
        stale-lock file to break and therefore no break/reacquire race
        at all (both the round-5 identity-check unlink and the interim
        rename-break could still delete a freshly acquired live lock in
        a narrow window). A stuck-but-alive holder is bounded by the
        10s acquisition timeout."""
        if not names:
            return
        import fcntl

        lock = os.path.join(self.path, "types.json.lock")
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        try:
            deadline = time.time() + 10.0
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if time.time() >= deadline:
                        raise ConcurrentWriteError(
                            f"could not acquire {lock} "
                            "(held >10s by a live writer?)")
                    time.sleep(0.005)
            merged = {**self.type_names(), **names}
            _atomic_write_json(os.path.join(self.path, "types.json"), merged)
        finally:
            os.close(fd)  # releases the flock

    def _merge_type_names_post_commit(self, names: dict[str, str]) -> None:
        """Sidecar merge for a load whose manifest ALREADY published: a
        failure here must not make the (successful) load raise — the
        caller would retry and append the same rows twice (round-5
        review). A lost decoration is harmless metadata and re-running
        the shaper restores it; warn and move on."""
        try:
            self.set_type_names(names)
        except Exception as e:
            import warnings

            warnings.warn(
                f"pool {self.path}: commit published but the types.json "
                f"merge failed ({e}); decorations {sorted(names)} were "
                "not recorded — re-run the shaper or call set_type_names",
                stacklevel=3)

    # -- I/O ---------------------------------------------------------------

    def scan(self, lower_bounds: dict[str, int] | None = None,
             at: int | None = None, at_ts: float | None = None,
             bounds: dict[str, tuple] | None = None) -> DataFrame | None:
        """Read the pool's committed state; None when the pool is empty.

        Schemas may widen across commits (the pool is heterogeneously
        typed, SURVEY §1.2) — mergeSchema unifies them with null-padding.
        With `lower_bounds`, whole commits outside the bounds are pruned
        from the file list (see committed_files); the caller MUST still
        apply the matching row filter (which parquet row-group stats then
        accelerate, since files are offset-sorted at write time).
        `at` time-travels to a historical commit; `at_ts` to the last
        commit at or before a wall-clock timestamp (both valid until
        vacuum() reclaims the files they reference). `bounds` applies
        file-level column-range skipping (see committed_files) — again the
        caller must still apply the matching row filter.
        """
        if at_ts is not None:
            if at is not None:
                raise ValueError("scan: pass at= or at_ts=, not both")
            at = self.seq_at_ts(at_ts)
            if at is None:
                return None
        files = self.committed_files(lower_bounds, at=at, bounds=bounds)
        if not files:
            return None
        # small-file-aware scan sizing lives in the ENGINE (read_packed),
        # not in callers or benches: a freshly ingested pool is many
        # per-trigger commits of small files until compaction runs, and
        # every reader should get packed tasks, not one dispatch per file
        return read_packed(self.spark, files, merge_schema=True)

    def load(self, df: DataFrame, message: str = "",
             cursors: dict[str, int] | None = None,
             occ_token: int | None = None,
             type_names: dict[str, str] | None = None,
             cluster_by: list[str] | None = None,
             zorder: bool = False,
             rows: int | None = None) -> int:
        """Atomically commit a batch (reference Load, etl/pool.go:56-58).

        Data is sorted by the pool key within partitions before writing so
        parquet row-group stats enable offset-range data skipping.
        `cursors` (optional) persists per-topic scan cursors with the
        commit (see stored_cursors). `type_names` (optional) merges named-
        type decorations into the pool's types.json sidecar AFTER the
        manifest publish succeeds — a writer that loses the OCC
        compare-and-set must not mutate the shared registry (round-4
        review). A crash in the instant between publish and sidecar
        write loses only the decoration, and set_type_names is
        idempotent — re-running the load's shaper restores it. Returns
        the number of committed rows.

        `occ_token` (optional) = the commit-log length the caller's
        read snapshot was taken at: the commit is published at EXACTLY
        that sequence or fails with ConcurrentWriteError — compare-and-
        set for read-modify-write writers (incremental rollup sync),
        whose commits are NOT independent of interleaved commits the
        way plain appends are. Without it, a seq collision just retries
        at the next number (append semantics).

        `cluster_by` (optional) range-clusters THE COMMIT ITSELF on the
        given dotted columns and records per-file [min,max] in the
        manifest (the same data-skipping stats compact(cluster_by=)
        produces) — so bounded scans skip this commit's non-matching
        files from the moment it lands, not only after the next
        compaction. This is what keeps an incremental index's probe
        bounded BETWEEN compactions: a sync commit's band/signature/pair
        key spaces land in separate files and a band probe never reads
        the other two. Costs one extra shuffle of the (small) batch.
        `zorder=True` (>= 2 cluster columns) uses the Morton layout so
        the commit's files skip on ANY clustered column (see
        zorder_column / compact(zorder=True)).
        """
        # `rows` (round 11, the ingest per-commit decomposition): a
        # caller that has ALREADY counted this exact frame (FromKafka's
        # presence aggregation counts each topic's persisted slice) can
        # pass the count and skip load's own materialization job — one
        # whole Spark job per topic per micro-batch, ~15-25% of the warm
        # small-batch commit (measured at 10k-row batches). The value
        # feeds file sizing and the manifest only; a wrong count cannot
        # corrupt data (stats come from the files actually written).
        n = df.count() if rows is None else int(rows)
        if n == 0:
            return 0
        file_id = uuid.uuid4().hex
        data_path = os.path.join(self.path, "data", file_id)
        # Size-aware write: small batches collapse to few files instead of
        # one tiny file per shuffle partition (a 20k-row commit is 1 file,
        # not 32) — file-count bloat is what kills manifest-driven lakes
        # at scale. Large batches keep their parallelism.
        # _plan_num_partitions probes the executed plan JVM-side — df.rdd
        # here paid an extra javaToPython wrapper stage + py4j round-trip
        # on EVERY commit (round-6 ADVICE; the helper already serves
        # rebalance_for_compute)
        plan_parts = _plan_num_partitions(df)
        target = max(1, min(plan_parts, n // 500_000 + 1))
        if cluster_by:
            # file-granularity skipping needs several key-space-disjoint
            # files per commit to bite (a probe always skips the OTHER
            # key spaces' files — e.g. a band probe never reads the
            # signature/pair files): 8 range files per clustered commit
            # buys that without exploding the small-files budget the
            # compaction cadence already manages; large commits keep
            # their size-derived parallelism
            if zorder:
                if len(cluster_by) < 2:
                    raise ValueError("zorder needs cluster_by with >= 2 "
                                     "columns")
                zv = zorder_column(df, cluster_by, n)
                out = (df.withColumn("_zv", zv)
                       .repartitionByRange(max(target, 8), F.col("_zv"),
                                           F.col("kafka.offset"))
                       .sortWithinPartitions(F.col("_zv"),
                                             F.col("kafka.offset"))
                       .drop("_zv"))
            else:
                ckeys = [F.col(c) for c in cluster_by] + [F.col("kafka.offset")]
                out = (df.repartitionByRange(max(target, 8), *ckeys)
                       .sortWithinPartitions(*ckeys))
        elif (n <= 500_000 and plan_parts > target
              and not os.environ.get("SPARK_GRAFT_NO_LOAD_REPART")
              and _scans_python_rdd(df)):
            # Small PYTHON-SOURCED batches shrink via repartition, not
            # coalesce (round 11): coalesce(1) makes ONE task drain every
            # upstream partition SERIALLY, and for a parallelize-backed
            # frame (createDataFrame of local rows = defaultParallelism
            # slices) each drain is a Python-runner round-trip — measured
            # 5.7-7.4 s for a 10-row commit vs 0.5 s with a shuffle into
            # one partition (the upstream slices drain in parallel; the
            # shuffle is bounded by this branch's n <= 500k rows). Row bag
            # and the offset sort are unchanged; only tie order within
            # the file can differ, which no reader contract depends on.
            # JVM/cached sources keep the narrow coalesce — their serial
            # drain is microseconds per partition and the added exchange
            # measurably LOSES on the warm ingest commit (interleaved
            # A/B: 0.72-0.79 s coalesce vs 0.76-0.97 s repartition).
            out = (df.repartition(target)
                   .sortWithinPartitions(F.col("kafka.offset")))
        else:
            out = (df.coalesce(target)
                   .sortWithinPartitions(F.col("kafka.offset")))
        out.write.mode("overwrite").parquet(data_path)
        parts = [
            os.path.join(data_path, f)
            for f in os.listdir(data_path)
            if f.endswith(".parquet")
        ]
        # Per-topic AND per-(topic, partition) offset range stats →
        # manifest-level commit pruning for bounded scans (committed_files).
        # Kafka offsets are per-partition sequences, so partition-aware
        # consumers (incremental rollups over multi-partition topics) need
        # the "t#p" keys; topic-level consumers (ETL cursors) keep using
        # the plain "t" keys. '#' cannot appear in a Kafka topic name, so
        # the two key spaces cannot collide.
        #
        # Stats come from the files JUST WRITTEN (a cheap local read), not
        # a re-evaluation of `df` — a source-backed frame could evaluate
        # differently per action, and stats that under-state the written
        # offset range would make bounded readers silently skip real data.
        # Envelope-ness is a schema test, never a blanket except (which
        # would let a transient stats failure permanently disable pruning
        # for the pool once a base manifest merges the None through).
        stats = _written_stats(self.spark, parts)
        manifest = {"files": sorted(parts), "message": message, "rows": n,
                    "stats": stats, "ts": time.time()}
        if cluster_by:
            col_stats = _file_col_stats(parts, cluster_by)
            if col_stats:
                manifest["col_stats"] = col_stats
        if cursors:
            manifest["cursors"] = cursors
        if occ_token is not None:
            try:
                _atomic_create_json(
                    os.path.join(self._commit_dir(), f"{occ_token:06d}.json"),
                    manifest,
                )
            except FileExistsError:
                raise ConcurrentWriteError(
                    f"pool {self.path} advanced past seq {occ_token} during a "
                    "read-modify-write commit; re-run"
                ) from None
            if type_names:
                self._merge_type_names_post_commit(type_names)
            return n
        # optimistic concurrency: claim the next sequence number; on a
        # collision another writer won that seq — append after it instead
        # (this load's data files are independent of theirs).
        for _ in range(64):
            seq = len(self.commits())
            try:
                _atomic_create_json(
                    os.path.join(self._commit_dir(), f"{seq:06d}.json"), manifest
                )
                if type_names:
                    self._merge_type_names_post_commit(type_names)
                return n
            except FileExistsError:
                continue
        raise ConcurrentWriteError(f"could not claim a commit seq in {self.path}")

    # -- maintenance -------------------------------------------------------

    def compact(self, target_rows: int = 4_000_000, message: str = "compact",
                keep_latest_by_key: bool = False,
                transform=None,
                cluster_by: list[str] | None = None,
                zorder: bool = False) -> int:
        """Rewrite the live file set into few large, globally offset-
        clustered files and commit a `base` manifest that supersedes all
        prior commits.

        `keep_latest_by_key` additionally applies Kafka log-compaction
        semantics to CDC pools: among `zed_type='data'` rows, only the
        highest-offset record per (topic, key) survives — the current
        state of each entity, exactly what a compacted Kafka topic
        retains. Non-data rows (done markers, cursors) are never dropped,
        so ETL idempotence bookkeeping is preserved. One extra shuffle on
        (topic, key), executed during the rewrite the pool was paying
        anyway.

        Streaming ingest commits every few seconds (thresh/interval,
        cmd/zync/from-kafka/command.go:79-82), so a pool accretes small
        files — the classic lakehouse small-files problem; at 100 TB an
        uncompacted manifest would list millions of files and every scan
        would pay per-file open cost. Compaction (a) range-partitions by
        (topic, offset) so each output file covers one contiguous offset
        range per topic — parquet row-group stats then prune bounded scans
        maximally — and (b) materializes the schema fuse: heterogeneous
        commit schemas become one wide parquet schema, so readers stop
        paying mergeSchema footer reads.

        `zorder=True` (with >= 2 `cluster_by` columns) lays files out on
        the interleaved-bit Morton key instead of lexicographic ranges,
        so per-file min/max stats prune scans on ANY clustered column,
        not just the leading one (see zorder_column).

        Old data files stay on disk for time travel (`scan(at=...)`) until
        vacuum() reclaims them. Crash-safe like load(): data first, one
        exclusive manifest publish last; concurrent appends make the
        publish fail with ConcurrentWriteError (never data loss). Returns
        the number of rows compacted.
        """
        # ONE snapshot of the commit log drives the whole rewrite: files,
        # stats, cursors, AND the claimed sequence number. Any load that
        # lands after this point takes seq >= len(snapshot), so our
        # exclusive publish at len(snapshot) collides and we abort — a
        # base manifest can never supersede a commit it did not read.
        snapshot = self.commits()
        if not snapshot:
            return 0
        manifests = []
        for c in snapshot:
            with open(os.path.join(self._commit_dir(), c)) as f:
                manifests.append(json.load(f))
        # The base-supersedes fold is deliberately NOT committed_files():
        # that would re-list the log and could see commits newer than
        # `snapshot`, breaking the OCC invariant that a base manifest
        # never supersedes a commit it did not read.
        files: list[str] = []
        for m in manifests:
            if m.get("base"):
                files = []
            files.extend(m["files"])
        df = read_packed(self.spark, files, merge_schema=True)
        if keep_latest_by_key and "key" in df.columns and "zed_type" in df.columns:
            from pyspark.sql import Window

            # Null-SAFE split: schema-widened rows from commits without a
            # zed_type column are null here; a null-unsafe == would drop
            # them from BOTH branches (data loss). Null-KEY data rows are
            # exempt from keying entirely — they are not updates to any
            # entity, and partitioning them together would collapse all of
            # them to one survivor per topic.
            is_keyed_data = F.col("zed_type").eqNullSafe("data") & F.col(
                "key"
            ).isNotNull()
            w = Window.partitionBy(F.col("kafka.topic"), F.col("key")).orderBy(
                F.col("kafka.offset").desc()
            )
            data = (
                df.filter(is_keyed_data)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            df = data.unionByName(df.filter(~is_keyed_data))
        transformed = None
        if transform is not None:
            # State-folding hook: maintenance policies can rewrite the live
            # row set during the compaction pass they were paying anyway
            # (e.g. streaming.incremental.fold merges rollup partials).
            # Runs under the same OCC publish, so a fold can never
            # supersede a commit it did not read.
            #
            # Materialize the transformed rows ONCE, at full parallelism,
            # BEFORE the count and the range-clustered write (round 9,
            # measured): the write's task count is the OUTPUT FILE count
            # (target_rows sizing — 2.1M rows under a 4M target is ONE
            # task), so an expensive transform (rebuild_embdedup's
            # within-cell pair re-emission, fold_tombstones' masking
            # windows) would otherwise recompute INSIDE those few tasks —
            # serially, and TWICE (count + write). The 200k-vector
            # embdedup resize sat >30 min in a single write task exactly
            # this way. MEMORY_AND_DISK: degrades to spill, never OOMs;
            # plain compactions (transform=None) skip the cache — their
            # per-row work is a read, not a computation.
            from pyspark import StorageLevel

            transformed = transform(df).persist(StorageLevel.MEMORY_AND_DISK)
            df = transformed
        try:
            n = df.count()
            nfiles = max(1, (n + target_rows - 1) // target_rows)
            if cluster_by and n:
                # Same rule as load()'s clustered commits: file-granularity
                # skipping needs several key-space-disjoint files to bite,
                # and a single-file base is also a single ROW GROUP — every
                # later bounded probe then scans the whole index in ONE task
                # (measured on the 200k-vector embdedup resize: post-rebuild
                # passes got SLOWER than pre-rebuild because the 2.16M-row
                # base landed in one file). 8 range files per clustered base
                # restores both skipping and scan parallelism without
                # touching the large-pool sizing (target_rows still governs
                # above 8 x target rows).
                nfiles = max(nfiles, 8)
            file_id = uuid.uuid4().hex
            data_path = os.path.join(self.path, "data", file_id)
            # Clustering: default layout is (topic, offset) — optimal for
            # the cursor/offset scans every sync does. `cluster_by` instead
            # range-clusters on the given dotted columns (offset as the
            # final tie key), so each output file covers a narrow range of
            # those values; their per-file min/max land in the manifest and
            # `scan(bounds=)` skips whole files — multi-dimensional data
            # skipping for the secondary-predicate scans (by user, by key,
            # by time) that offset order can't serve. At 100 TB this is the
            # difference between reading one file and reading the pool.
            if zorder:
                if not cluster_by or len(cluster_by) < 2:
                    raise ValueError(
                        "zorder needs cluster_by with >= 2 columns (with "
                        "one column, plain range clustering already skips "
                        "optimally)")
                # interleaved-bit layout: every cluster column gets range
                # locality, so scan(bounds=) prunes on ANY of them — see
                # zorder_column. The key is layout-only and dropped after
                # the range shuffle + sort (projection preserves
                # partitioning).
                zv = zorder_column(df, cluster_by, n)
                out_df = (
                    df.withColumn("_zv", zv)
                    .repartitionByRange(nfiles, F.col("_zv"),
                                        F.col("kafka.offset"))
                    .sortWithinPartitions(F.col("_zv"), F.col("kafka.offset"))
                    .drop("_zv")
                )
            else:
                ckeys = (
                    [F.col(c) for c in cluster_by] + [F.col("kafka.offset")]
                    if cluster_by
                    else [F.col("kafka.topic"), F.col("kafka.offset")]
                )
                out_df = df.repartitionByRange(nfiles, *ckeys) \
                    .sortWithinPartitions(*ckeys)
            out_df.write.mode("overwrite").parquet(data_path)
        finally:
            # the try spans count(), zorder/repartition plan-building AND
            # the write: a failure in ANY of them must not leave the
            # MEMORY_AND_DISK cache pinned until plan GC (round-9 ADVICE)
            if transformed is not None:
                transformed.unpersist()
        parts = [
            os.path.join(data_path, f)
            for f in os.listdir(data_path)
            if f.endswith(".parquet")
        ]
        # kafka.topic/offset stats ride along for free (metadata-only):
        # consume/pushdown-derived bounds then file-skip on ANY compacted
        # pool, not just explicitly clustered ones — and the default
        # (topic, offset) layout makes those stats maximally selective
        col_stats = _file_col_stats(
            parts, (cluster_by or []) + ["kafka.topic", "kafka.offset"]
        ) or None
        # Merge per-topic offset stats across the superseded manifests so
        # bounded scans keep pruning; carry cursors forward likewise.
        stats: dict[str, list[int]] | None = {}
        cursors: dict[str, int] = {}
        for m in manifests:
            s = m.get("stats")
            if stats is not None and s is None:
                stats = None  # a stat-less commit poisons the merge
            elif stats is not None:
                for t, (lo, hi) in s.items():
                    if t in stats:
                        stats[t] = [min(stats[t][0], lo), max(stats[t][1], hi)]
                    else:
                        stats[t] = [lo, hi]
            for t, v in (m.get("cursors") or {}).items():
                cursors[t] = int(v)
        seq = len(snapshot)
        manifest = {"files": sorted(parts), "message": message, "rows": n,
                    "stats": stats, "base": True, "ts": time.time()}
        if cursors:
            manifest["cursors"] = cursors
        if col_stats:
            manifest["col_stats"] = col_stats
        try:
            _atomic_create_json(
                os.path.join(self._commit_dir(), f"{seq:06d}.json"), manifest
            )
        except FileExistsError:
            # a load() landed after our snapshot; publishing the base now
            # would supersede data it never read. Abort — the orphaned
            # rewrite files are invisible without a manifest.
            raise ConcurrentWriteError(
                f"pool {self.path} advanced during compaction; re-run"
            ) from None
        return n

    def commits_since_base(self) -> int:
        """Delta commits on top of the last compaction checkpoint — the
        signal maintenance policies key on (auto-compaction)."""
        n = 0
        for c in self.commits():
            with open(os.path.join(self._commit_dir(), c)) as f:
                if json.load(f).get("base"):
                    n = 0
                else:
                    n += 1
        return n

    def vacuum(self, retention_s: float = 3600.0,
               dry_run: bool = False) -> int:
        """Delete data files not referenced by the LIVE view (everything a
        compaction superseded). Time travel to pre-compaction commits stops
        working — standard lakehouse VACUUM semantics. Returns the number
        of files removed.

        `retention_s` protects TWO classes of in-flight work (0 disables
        both guards — single-writer, no-reader maintenance only):

        - in-flight WRITERS: directories modified within the window are
          kept even if unreferenced — they may belong to a concurrent
          load()/compact() that wrote data but has not published its
          manifest yet; deleting them would let the in-flight publish
          commit a manifest of vanished files (the reason Delta's VACUUM
          has a retention window).
        - in-flight READERS (round 8, the read-consistency contract):
          SUPERSEDED files — once referenced by a manifest, no longer
          live — stay reclaimable only when the newest base manifest is
          older than the window. A scan/search/view resolves its file
          list against some committed manifest state; the files it
          resolved were live then, so they cannot vanish until at least
          `retention_s` after the compaction that superseded them. A
          reader that resolved files and materializes WITHIN the window
          always succeeds; one that dwells PAST the window fails LOUDLY
          (Spark's ignoreMissingFiles default is false, so a vanished
          file raises — never silent partial rows; pinned in
          tests/test_reader_soak.py). Size retention_s above the longest
          expected query dwell, exactly like Delta.

        `dry_run=True` counts what a real vacuum would delete without
        touching disk — ONE discovery walk shared by the retention
        policy's census (health.check_pool_health) and the cure, so the
        report and the reclaim can never disagree (round-7 review)."""
        live = set(self.committed_files())
        # every file ANY manifest ever referenced + the newest base's ts:
        # "superseded" (was referenced, now isn't) is what the reader
        # window protects; never-referenced dirs are writer orphans and
        # take the mtime guard instead. One pass over the commit log —
        # the same metadata read committed_files already pays.
        ever: set[str] = set()
        newest_base_ts = None
        for c in self.commits():
            with open(os.path.join(self._commit_dir(), c)) as f:
                manifest = json.load(f)
            ever.update(manifest["files"])
            if manifest.get("base"):
                # pre-feature manifests carry no ts: treat as arbitrarily
                # old (same convention as seq_at_ts)
                newest_base_ts = manifest.get("ts", 0.0)
        now = time.time()
        removed = 0
        data_root = os.path.join(self.path, "data")
        for d in os.listdir(data_root):
            sub = os.path.join(data_root, d)
            if not os.path.isdir(sub):
                continue  # stray file under data/: not a writer's dir
            parquets = [f for f in os.listdir(sub) if f.endswith(".parquet")]
            paths = [os.path.join(sub, f) for f in parquets]
            if any(p in live for p in paths):
                continue
            if (retention_s > 0 and newest_base_ts is not None
                    and any(p in ever for p in paths)
                    and now - newest_base_ts < retention_s):
                continue  # superseded inside the reader window
            try:
                if now - os.path.getmtime(sub) < retention_s:
                    continue  # possibly an in-flight writer's files
            except OSError:
                continue
            removed += len(parquets)
            if not dry_run:
                shutil.rmtree(sub)  # whole load/compact dir is dead (incl. _SUCCESS)
        return removed

    # -- offset queries (etl/pool.go:60-81, fifo/lake.go:62-82) ------------

    def next_producer_offsets(self) -> dict[str, int]:
        """max(kafka.offset)+1 per topic over data records — where newly
        produced records for each output topic should start."""
        df = self.scan()
        if df is None:
            return {}
        rows = (
            df.filter(F.col("zed_type") == "data")
            .groupBy(F.col("kafka.topic").alias("topic"))
            .agg(F.max(F.col("kafka.offset")).alias("mx"))
            .collect()
        )
        return {r["topic"]: r["mx"] + 1 for r in rows}

    def next_producer_offsets_by_partition(self) -> dict[str, int]:
        """max(kafka.offset)+1 per (topic, partition) over data records,
        keyed "topic#partition" — where newly produced records for each
        output partition should start. The multi-partition ETL's offset
        bases: output offsets are per-partition sequences (Kafka's own
        model), so two partitions' windows must never share a base."""
        df = self.scan()
        if df is None:
            return {}
        rows = (
            df.filter(F.col("zed_type") == "data")
            .groupBy(F.col("kafka.topic").alias("topic"),
                     F.col("kafka.partition").alias("p"))
            .agg(F.max(F.col("kafka.offset")).alias("mx"))
            .collect()
        )
        return {f"{r['topic']}#{int(r['p'])}": r["mx"] + 1 for r in rows}

    def stored_cursors(self) -> dict[str, int]:
        """Per input topic, the scan cursor persisted with the most recent
        commit that recorded one: every existing offset below the cursor is
        processed, so incremental scans may start there — the cursor range
        limit of design.md / README pseudo-code that the reference never
        implemented (etl/build.go:9-18). Cursors are computed by the ETL
        run itself (min still-pending offset, else max-scanned+1) and
        committed atomically with outputs+markers, so they are exactly as
        durable as the markers they summarize.
        """
        cursors: dict[str, int] = {}
        for c in self.commits():
            with open(os.path.join(self._commit_dir(), c)) as f:
                manifest = json.load(f)
            for t, v in (manifest.get("cursors") or {}).items():
                cursors[t] = int(v)
        return cursors

    def _manifest_partition_his(self, topic: str) -> dict[int, int] | None:
        """Per-partition max offsets for `topic` folded from the live
        manifest view's stats — the manifests already KNOW the answer, so
        the per-trigger resume query costs a JSON fold, not a pool scan.
        None when any live manifest can't attribute the topic's rows to
        partitions (stat-less commit, or pre-per-partition stats) — the
        caller falls back to scanning."""
        his: dict[int, int] = {}
        ok = True
        prefix = topic + "#"
        for c in self.commits():
            with open(os.path.join(self._commit_dir(), c)) as f:
                m = json.load(f)
            if m.get("base"):
                his, ok = {}, True  # base stats merged everything prior
            s = m.get("stats")
            if s is None:
                ok = False
                continue
            if topic in s and not any(k.startswith(prefix) for k in s):
                ok = False  # legacy topic-level stats: partition unknown
                continue
            for k, v in s.items():
                if k.startswith(prefix):
                    p = int(k.rsplit("#", 1)[1])
                    his[p] = max(his.get(p, v[1]), v[1])
        return his if ok else None

    def next_consumer_offset(self, topic: str) -> int:
        """max(offset)+1 over records of `topic` (ingest resume point,
        fifo/lake.go:62-82); 0 for an empty pool. Served from manifest
        stats when possible (no scan)."""
        his = self._manifest_partition_his(topic)
        if his is not None:
            return (max(his.values()) + 1) if his else 0
        df = self.scan()
        if df is None:
            return 0
        row = (
            df.filter(F.col("kafka.topic") == topic)
            .agg(F.max(F.col("kafka.offset")).alias("mx"))
            .collect()[0]
        )
        return 0 if row["mx"] is None else row["mx"] + 1

    def next_consumer_offsets_by_partition(self, topic: str) -> dict[int, int]:
        """Per-partition resume points for `topic` — the multi-partition
        generalization of next_consumer_offset. The reference pins
        partition 0 for CDC ordering (fifo/consumer.go:59-63); ingest at
        scale wants one consumer per partition, each resuming from its own
        committed high-water mark. Offsets are per-partition sequences in
        Kafka, so the max is taken per (topic, partition). Served from
        manifest stats when possible (no scan)."""
        his = self._manifest_partition_his(topic)
        if his is not None:
            return {p: hi + 1 for p, hi in his.items()}
        df = self.scan()
        if df is None:
            return {}
        rows = (
            df.filter(F.col("kafka.topic") == topic)
            .groupBy(F.col("kafka.partition").alias("p"))
            .agg(F.max(F.col("kafka.offset")).alias("mx"))
            .collect()
        )
        return {int(r["p"]): r["mx"] + 1 for r in rows}


# Scan packing for many-small-file reads. Spark's own split math
# (FilePartition.maxSplitBytes) sizes splits so EVERY core gets one —
# bytesPerCore = padded / defaultParallelism — even when that makes
# tasks sub-millisecond, so a medium table stored as many small files
# pays scheduler dispatch as a first-order cost (measured ~25% of the
# pool-layout bench section in round 4, where it was hidden by a
# bench-scoped minPartitionNum knob; round 5 moves the sizing HERE, into
# the engine, where a real user's scan benefits). The engine packs at
# QUARTER-of-cores granularity instead: 4x fewer dispatches in the
# small-data regime while keeping enough fan-out that CPU-bound scans
# (regex-heavy text queries over small compressed inputs) still spread.
# At scale bytesPerCore exceeds maxPartitionBytes long before the
# divisor matters and the bound reproduces Spark's own partitioning
# exactly — the coalesce is a no-op on any 100 TB scan.
_PACK_CORE_FRACTION = 4
_PACK_STAT_CAP = 65536  # above this many files, skip the driver-side stat


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """A Spark size conf in bytes (values may carry a b/k/m/g suffix)."""
    try:
        v = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if v.endswith(suf):
            v = v[: -len(suf)]
            mult = m
            break
    try:
        return int(float(v) * mult)
    except ValueError:
        return default


def _pack_target(spark: SparkSession, total_bytes: int, n_files: int) -> int:
    """Scan partition count under Spark's packing bound with the
    one-task-per-core divisor relaxed to one per _PACK_CORE_FRACTION
    cores:

        padded     = total + n_files * openCost      (Spark's own padding)
        task_bytes = min(maxPartitionBytes,
                         max(openCost, padded / (cores / 4)))
        target     = ceil(padded / task_bytes)

    Identical to Spark's FilePartition math except the divisor, so the
    result only differs (is smaller) in the small-data regime where
    dispatch cost dominates. At scale padded/(cores/4) exceeds
    maxPartitionBytes and target equals what Spark plans anyway."""
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    padded = total_bytes + n_files * open_cost
    cores = max(1, spark.sparkContext.defaultParallelism
                // _PACK_CORE_FRACTION)
    task_bytes = min(max_pb, max(open_cost, padded // cores))
    return max(1, (padded + task_bytes - 1) // task_bytes)


def read_packed(spark: SparkSession, files: list[str],
                merge_schema: bool = False) -> DataFrame:
    """Read parquet files with scan tasks sized for the DATA, not the
    core count: when the files are small enough that Spark's split math
    would fan out into sub-16 MB tasks, coalesce the scan to the packing
    bound (_pack_target). coalesce() is narrow — each task reads several
    file partitions back to back, the same I/O in fewer dispatches — and
    Catalyst pushes filters/pruning through Repartition nodes, so scan
    pushdown is unaffected (pinned in test_pool). File sizes come from a
    driver-side stat of the (already pruned) file list, capped at
    _PACK_STAT_CAP files — a pool that large is past the small-task
    regime and reads at Spark's own partitioning.

    The byte stat rides the returned frame as a plain Python attribute
    (`df._zs_bytes`) — a DIRECT-FRAME-ONLY contract: any DataFrame
    transformation (filter/select/...) returns a new object without it,
    and size-gated consumers (similarity._corpus_bytes) then read
    "unknowable" and take the conservative scale shape. That fallback is
    CORRECT, only potentially slower — callers that want the small-frame
    fast path on a derived frame must re-attach the stat themselves."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*files)
    if 1 < len(files) <= _PACK_STAT_CAP:
        try:
            total = sum(os.path.getsize(f) for f in files)
        except OSError:
            return df  # a file vanished mid-plan: let Spark's read report
        target = _pack_target(spark, total, len(files))
        if target < len(files):
            df = df.coalesce(target)
        # carry the stat: inputFiles() goes EMPTY through the coalesce's
        # Repartition node, so size-gated consumers downstream
        # (similarity._corpus_bytes) would otherwise read "unknowable"
        # for exactly the small frames the gates exist for
        df._zs_bytes = total
    return df


def zorder_column(df: DataFrame, cols: list[str], n_rows: int,
                  bits: int = 5, sample_rows: int = 20_000) -> Column:
    """Z-order (Morton) key over `cols` as a pure Column expression.

    Lexicographic range clustering on (a, b) skips files well on `a` but
    barely on `b` (every file spans most of b's range). Interleaving the
    bits of per-column quantile-bucket ranks gives every clustered column
    locality, so per-file min/max stats prune scans on ANY of them — the
    lakehouse multi-dimensional skipping trick (Delta OPTIMIZE ZORDER).

    Bucketing comes from a driver-side quantile sample (metadata-sized:
    `sample_rows` values per column). The bucket function is LAYOUT-ONLY:
    results never depend on it — file skipping derives from the recorded
    per-file min/max of the real columns, so a skewed sample can only
    cost skip efficiency, never correctness. NULLs land in bucket 0.
    """
    frac = min(1.0, sample_rows / max(n_rows, 1))
    aliased = [F.col(c).alias(f"_z{i}") for i, c in enumerate(cols)]
    samp = df.select(*aliased).sample(fraction=frac, seed=7).collect()
    n_buckets = 1 << bits
    zv: Column = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        raw = [r[ci] for r in samp if r[ci] is not None]
        try:
            vals = sorted(raw)
        except TypeError:  # mixed incomparable types: any consistent order
            vals = sorted(raw, key=repr)
        bnds = []
        for k in range(1, n_buckets):
            v = vals[len(vals) * k // n_buckets] if vals else None
            if v is not None and (not bnds or bnds[-1] != v):
                bnds.append(v)
        if not bnds:
            continue
        bucket = F.size(
            F.filter(F.array(*[F.lit(b) for b in bnds]),
                     lambda b: b <= F.col(c))
        ).cast("long")
        for bit in range(bits):
            zv = zv + F.shiftleft(
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + ci,
            ).cast("long")
    return zv


def local_paths(files: list[str]) -> list[str]:
    """Strip the `file:` URI scheme Spark's inputFiles()/listing APIs
    report for local storage — the ONE place the convention lives
    (total_row_groups and dedup._spread both consume it)."""
    return [f[5:] if f.startswith("file:") else f for f in files]


# path -> num_row_groups. Committed pool files and testdata parquet are
# immutable (pools never rewrite a data file in place — compaction writes
# NEW files), so a plain path-keyed memo is sound and makes repeat
# guard probes free. Crude growth bound: cleared when oversized.
_RG_MEMO: dict[str, int] = {}


def total_row_groups(files: list[str], cap: int = 1024) -> int | None:
    """Total parquet ROW GROUPS across `files` — the vectorized reader's
    true parallelism quantum (driver-side footer metadata reads,
    memoized; immutable files make the memo sound). Byte-based split
    estimates and plan partition counts both overcount a
    single-row-group file: Spark happily plans 32 byte-range splits
    over it, then ONE task (the split containing the row-group start)
    reads every row while 31 read nothing — measured at the gsf100
    decade as a 72-second single hot task in an 8M-pair ANN scoring
    stage (SCALING §14).

    Returns a LOWER BOUND when exact footers are unavailable: past
    `cap` files, or for remote/unreadable paths, every parquet file
    still has >= 1 row group, so len(files) is a true bound — the
    guard keeps working for wide layouts and remote lakes instead of
    silently disengaging (round-7 review; the earlier None-above-64
    cutoff left a 65-file single-row-group layout unguarded on a
    128-core host). None only for non-parquet inputs (no claim)."""
    paths = local_paths(files)
    if not paths or not all(p.endswith(".parquet") for p in paths):
        return None
    if len(paths) > cap:
        return len(paths)  # >=1 row group per file: a true lower bound
    if len(_RG_MEMO) > 65536:
        _RG_MEMO.clear()
    total = 0
    for p in paths:
        n = _RG_MEMO.get(p)
        if n is None:
            try:
                import pyarrow.parquet as pq

                n = pq.ParquetFile(p).metadata.num_row_groups
            except Exception:
                # unreadable driver-side (remote scheme, perms): this
                # file contributes its >=1-row-group lower bound; do
                # NOT memoize a guess
                total += 1
                continue
            _RG_MEMO[p] = n
        total += n
    return total


def rebalance_for_compute(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Give a compute-dense map stage at least core-count parallelism.

    A parquet ROW GROUP is the vectorized reader's parallelism quantum:
    a single-row-group file pins all downstream per-row work (md5
    token hashing, tokenization, fingerprint folds) to ONE task no
    matter how the byte-split config slices the file. When the input
    arrives with fewer than defaultParallelism × `min_fraction`
    partitions, round-robin repartition to defaultParallelism: the
    shuffle moves only the narrow projected input — by definition small
    at that partition count — and buys every core for the expensive map
    (measured on the headline text pipeline: 2.38s → 0.34s at gsf1,
    0.40s → 0.19s at sf0.1). At any real scale the input already has
    ≥ cores partitions and this is a NO-OP — the corpus never shuffles
    on the 100 TB path."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    threshold = max(1, int(cores * min_fraction))
    parts = _plan_num_partitions(df)
    if parts >= threshold:
        # Row groups bound parallelism ONLY at the scan: a plan whose
        # final stage sits behind an exchange (explicit repartition,
        # aggregation, join) has real post-shuffle parallelism that a
        # single-row-group INPUT cannot pin — clamping it would force a
        # spurious full reshuffle (round-7 review). Footers are read
        # only here, where they can change the verdict; when parts is
        # already under the threshold the repartition happens anyway.
        qe_plan = df._jdf.queryExecution().executedPlan().toString()
        if "Exchange" not in qe_plan:
            rgs = total_row_groups(df.inputFiles())
            if rgs is not None:
                parts = min(parts, rgs)
    if parts < threshold:
        return df.repartition(cores)
    return df


def _scans_python_rdd(df: DataFrame) -> bool:
    """True when the frame's optimized plan reads a Python-backed RDD
    (createDataFrame of local rows → LogicalRDD / ExternalRDD): exactly
    the sources whose partitions cost a Python-runner round-trip EACH to
    drain, which is what makes a serial coalesce(1) pathological in
    Pool.load. A CACHED python-sourced frame reads its InMemoryRelation
    instead (cheap drain) and correctly stays on the coalesce path.

    Walks the optimized plan's LEAVES (round 12): InMemoryRelation is a
    leaf whose toString prints its ORIGINAL child plan (LogicalRDD and
    all), so the earlier string probe let ANY cached subtree mask a
    fresh LogicalRDD unioned/joined beside it — that frame fell back to
    coalesce(1) and re-hit the serial drain. A cache node among the
    leaves masks only itself; any LogicalRDD leaf is a live Python
    drain. One py4j round-trip; only evaluated on the small-batch
    branch."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        for i in range(leaves.size()):
            if leaves.apply(i).nodeName() in ("LogicalRDD", "ExternalRDD"):
                return True
        return False
    except Exception:
        # py4j surface drift: keep the round-11 string heuristic so the
        # path degrades to the old (conservative) behavior, never to an
        # error inside load.
        try:
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception:
            return False
        if "InMemoryRelation" in plan:
            return False
        return "LogicalRDD" in plan or "ExistingRDD" in plan


def _plan_num_partitions(df: DataFrame) -> int:
    """Partition count of `df`'s physical plan, probed JVM-side.

    `queryExecution().toRdd()` builds the executed plan's RDD lineage
    (file listing + split planning — exactly the InputPartition count
    the scheduler would use) WITHOUT `df.rdd`'s extra javaToPython
    wrapping, which adds a Python-serializer map stage and a second
    py4j round-trip per call (round-5 verdict watch-item; measured
    ~142ms → ~123ms per fresh-plan probe at sf0.1, the residual being
    unavoidable analysis + file listing). Falls back to `df.rdd` on
    any py4j surface drift so behavior can never regress to an error.
    """
    try:
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df.rdd.getNumPartitions()


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _atomic_create_json(path: str, obj: dict) -> None:
    """Publish `obj` at `path` iff `path` does not exist yet: os.link is
    atomic AND exclusive (unlike rename, which silently overwrites), so
    exactly one writer can claim a commit sequence number. Raises
    FileExistsError for the loser."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)


def _written_stats(spark: SparkSession, parts: list[str]) -> dict | None:
    """Per-topic and per-(topic, partition) offset ranges of the files a
    load just wrote. None when the frame is not envelope-shaped (no
    kafka.{topic,partition,offset} struct) — such commits are never
    pruned. Rows with null kafka metadata are excluded from stats (they
    cannot match a bounded reader's offset predicate anyway, and a
    't#None' key would crash every later bounded scan)."""
    wr = spark.read.parquet(*parts)
    kafka = next((f for f in wr.schema.fields if f.name == "kafka"), None)
    from pyspark.sql.types import StructType as _St

    if kafka is None or not isinstance(kafka.dataType, _St):
        return None
    names = {f.name for f in kafka.dataType.fields}
    if not {"topic", "partition", "offset"} <= names:
        return None
    stats: dict[str, list[int]] = {}
    for r in (
        wr.filter(
            F.col("kafka.topic").isNotNull()
            & F.col("kafka.partition").isNotNull()
            & F.col("kafka.offset").isNotNull()
        )
        .groupBy(
            F.col("kafka.topic").alias("t"),
            F.col("kafka.partition").alias("p"),
        )
        .agg(
            F.min(F.col("kafka.offset")).alias("lo"),
            F.max(F.col("kafka.offset")).alias("hi"),
        )
        .collect()
    ):
        stats[f"{r['t']}#{r['p']}"] = [r["lo"], r["hi"]]
        t = stats.get(r["t"])
        stats[r["t"]] = (
            [r["lo"], r["hi"]]
            if t is None
            else [min(t[0], r["lo"]), max(t[1], r["hi"])]
        )
    return stats


def _bounds_keep(stats: dict, lower_bounds: dict) -> bool:
    """Can this commit still hold qualifying rows for any bounded topic?

    int bound: topic-level (legacy ETL-cursor semantics). dict bound
    {partition: offset}: judged against the commit's per-partition "t#p"
    stats, unseen partitions defaulting to 0; a commit with only legacy
    topic-level stats can't be partition-pruned, so it is kept whenever
    the topic is present."""
    for topic, bound in lower_bounds.items():
        if isinstance(bound, dict):
            pkeys = [k for k in stats if k.startswith(topic + "#")]
            if not pkeys:
                if topic in stats:
                    return True
                continue
            for k in pkeys:
                p = int(k.rsplit("#", 1)[1])
                if stats[k][1] >= bound.get(p, 0):
                    return True
        elif topic in stats and stats[topic][1] >= bound:
            return True
    return False


def _json_safe(v):
    """Parquet footer stats → JSON-storable, order-preserving values.
    Timestamps/dates become ISO strings (lexicographic == chronological);
    bytes decode best-effort; numerics/strings pass through."""
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _file_col_stats(paths: list[str], cols: list[str]) -> dict[str, dict]:
    """Per-file [min, max] for the given dotted leaf columns, read from
    the parquet footers of files this process just wrote (no data scan).
    Columns whose footers lack min/max (e.g. unsupported physical types)
    are simply omitted — absence of stats means 'never skip'."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        by_path = {md.schema.column(i).path: i for i in range(md.num_columns)}
        st: dict[str, list] = {}
        for c in cols:
            i = by_path.get(c)
            if i is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(i).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if ok and lo is not None:
                st[c] = [_json_safe(lo), _json_safe(hi)]
        if st:
            out[p] = st
    return out


def _may_overlap(file_stats: dict | None, bounds: dict[str, tuple | list]) -> bool:
    """Conservative file-skip test: False only when some bounded column's
    recorded [min,max] provably cannot intersect the bound — a (lo, hi)
    range tuple, or a list of admissible values (keep iff any value lies
    within [min,max]; binary search, so a 256-bucket probe set costs
    log n per file). Missing stats (whole file or column) always keep
    the file."""
    import bisect

    if not file_stats:
        return True
    for col, bound in bounds.items():
        s = file_stats.get(col)
        if s is None:
            continue
        try:
            if isinstance(bound, (list, set, frozenset)):
                vals = sorted(bound)
                # first value >= file min; in range iff it is also <= file max
                i = bisect.bisect_left(vals, s[0])
                if i >= len(vals) or vals[i] > s[1]:
                    return False
                continue
            lo, hi = bound
            if (hi is not None and s[0] > hi) or (lo is not None and s[1] < lo):
                return False
        except TypeError:
            # bound/stat type mismatch (e.g. a string literal against a
            # numeric column from pushdown-extracted user predicates):
            # incomparable means "cannot prove disjoint" — keep the file
            continue
    return True
