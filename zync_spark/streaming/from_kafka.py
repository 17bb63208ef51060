"""from-kafka: continuous multi-topic → multi-pool sync
(cmd/zync/from-kafka/command.go:33-302, SURVEY §3.2).

Pipeline: kafka frame (topic, partition, offset, key, value bytes)
→ decode key/value (Avro wire format via registry, or Connect JSON)
→ envelope {kafka:{topic,partition,offset}, key, value, zed_type='data'}
→ optional shaper (zed-expression subset → Columns)
→ per-pool append with resume + monotonicity guard.

The reference's two-goroutine channel design (reader + per-pool loaders,
thresh/interval batching) maps onto Structured Streaming micro-batches:
`trigger(processingTime=interval)` + `maxOffsetsPerTrigger=thresh` bound
latency and commit size the same way; `foreachBatch` plays the loader.
All logic below the source is plain DataFrame → testable without a broker
by feeding any frame-shaped DataFrame (tests use in-memory frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from zync_spark.envelope import ZED_TYPE_DATA
from zync_spark.pool import Pool
from zync_spark.sources import connectjson
from zync_spark.sources.avro import decode_column
from zync_spark.sources.kafka import kafka_available, read_stream
from zync_spark.sources.registry import BaseRegistry


class MonotonicityError(RuntimeError):
    """Incoming offset below the pool's resume offset
    (fifo/consumer.go:117-122). Retained for API compatibility: since
    duplicate redelivery is expected under checkpoint replay, commit_batch
    now FILTERS below-resume offsets idempotently instead of raising."""


class FromKafka:
    def __init__(
        self,
        spark: SparkSession,
        topic_pools: dict[str, Pool],
        key_schema: StructType,
        value_schema: StructType,
        registry: BaseRegistry | None = None,
        format: str = "avro",
        shaper: str | None = None,
        auto_compact_every: int | None = None,
        dead_letter_pool: Pool | None = None,
        rollups: list[tuple] | None = None,
        indexes: list[tuple] | None = None,
        upsert_indexes: bool = False,
        health_every: int | None = None,
        auto_rebuild: bool = False,
        health_opts: dict[str, dict] | None = None,
        auto_vacuum_s: float | None = None,
    ):
        self.spark = spark
        self.topic_pools = topic_pools
        self.key_schema = key_schema
        self.value_schema = value_schema
        self.registry = registry
        self.format = format
        self.shaper = shaper
        self.auto_compact_every = auto_compact_every
        self.dead_letter_pool = dead_letter_pool
        # streaming materialized views: (RollupSpec, dest Pool, [topics])
        # entries are sync()'d after each micro-batch commit — the rollup
        # stays fresh to within one trigger interval, at O(new data) cost
        # per batch (streaming/incremental.py). All topics of one entry
        # must land in the same ingest pool — validated HERE so a bad
        # spec fails at construction, not mid-stream after a batch
        # committed (where the foreachBatch retry would then trip the
        # monotonicity guard and wedge the query).
        self.rollups = rollups or []
        # streaming index maintenance: (DedupIndexSpec | AnnIndexSpec,
        # dest Pool, [topics]) entries sync after each micro-batch commit
        # — the dedup/ANN indexes stay fresh to within one trigger at
        # O(new data) per batch, exactly the rollup contract
        # (streaming/dedup_index.py, streaming/ann_index.py).
        self.indexes = indexes or []
        # upsert CDC semantics for the index entries: each micro-batch's
        # doc/vec ids tombstone their previous versions in the same
        # index commit (sync_*(upsert=True)) — re-published entities
        # replace instead of accumulate. Append-only ingest (default)
        # pays nothing.
        self.upsert_indexes = upsert_indexes
        # Health cadence (streaming/health.py): every `health_every`
        # micro-batches that synced an index, run its family's
        # check_*_health; unhealthy verdicts WARN with the JSON verdict.
        # With auto_rebuild=True the loop also APPLIES the structured
        # recommendation (rebuild_args) — safe here because this loop is
        # the index pool's single writer, so the rebuild's OCC publish
        # cannot collide with a concurrent sync. A rebuild that changes
        # prefix_len returns a NEW spec, which replaces the entry in
        # place so later syncs/validations use the new contract.
        self.health_every = health_every
        self.auto_rebuild = auto_rebuild
        # Per-index check thresholds, keyed by spec.name (kwargs passed
        # straight to that family's check_*_health — e.g.
        # {"embeddings_ann": {"min_recall": 0.8, "nprobe": 4}}); the
        # reserved key "pool" configures the retention pass
        # (check_pool_health kwargs, e.g. {"max_masked_fraction": 0.1}).
        # Hard-coded defaults made auto_rebuild a footgun: a workload
        # that structurally can't clear a default re-paid a full
        # O(corpus) rebuild every cadence (round-6 ADVICE) — now the
        # thresholds are per-deployment AND _applied_rebuilds backstops
        # repeats with a no-improvement cooldown.
        self.health_opts = health_opts or {}
        # Age-based vacuum knob: after a retention-driven fold_compact,
        # physically reclaim superseded data files older than this
        # (Pool.vacuum retention window — in-flight writers' fresh
        # files survive). None = keep them for time travel.
        self.auto_vacuum_s = auto_vacuum_s
        # spec.name -> json(rebuild_args) of the last APPLIED rebuild;
        # cleared when the index measures healthy again
        self._applied_rebuilds: dict[str, str] = {}
        # spec.name -> POST-rebuild max_cell_occupancy of the last
        # applied occupancy rebuild (round 10): the arg-identity
        # cooldown above cannot catch the §18.5 loop where rec_cells
        # drifts with N (448→449→…) so the args are never identical but
        # each rebuild is equally useless. If a new occupancy verdict's
        # max is within 1.25x of what the LAST rebuild already failed
        # to cure, the workload's quantizer geometry caps the cells —
        # suppress the repeat until real growth (or a healthy verdict)
        # changes the picture.
        self._occ_results: dict[str, int] = {}
        self._batches_since_health = 0
        for kind, entries in (("rollup", self.rollups),
                              ("index", self.indexes)):
            for spec, _dest, topics in entries:
                missing = [t for t in topics if t not in topic_pools]
                if missing:
                    raise ValueError(
                        f"{kind} {spec.name!r}: topics {missing} are not "
                        f"ingest topics (have {sorted(topic_pools)})"
                    )
                if len({id(topic_pools[t]) for t in topics}) > 1:
                    raise ValueError(
                        f"{kind} {spec.name!r}: its topics must share one "
                        "ingest pool (cursors are tracked against a single "
                        "source)"
                    )
        if self.indexes:
            from zync_spark.streaming.ann_index import AnnIndexSpec
            from zync_spark.streaming.dedup_index import DedupIndexSpec
            from zync_spark.streaming.embdedup_index import \
                EmbDedupIndexSpec
            from zync_spark.streaming.span_index import SpanIndexSpec
            from zync_spark.streaming.text_index import TextIndexSpec

            for spec, _d, _t in self.indexes:
                if not isinstance(spec,
                                  (DedupIndexSpec, AnnIndexSpec,
                                   TextIndexSpec, SpanIndexSpec,
                                   EmbDedupIndexSpec)):
                    raise TypeError(
                        f"index entry {spec!r}: expected DedupIndexSpec, "
                        "AnnIndexSpec, TextIndexSpec, SpanIndexSpec, or "
                        "EmbDedupIndexSpec"
                    )  # fail at construction, not mid-stream

    # -- resume ------------------------------------------------------------

    def resume_offsets(self) -> dict[str, int]:
        """Per-topic next offset from each pool's committed state
        (fifo/lake.go:62-82): consume restarts exactly after the last
        committed record — crash-recoverable without Kafka group state.
        Single-partition view (the reference's CDC assumption)."""
        return {
            topic: pool.next_consumer_offset(topic)
            for topic, pool in self.topic_pools.items()
        }

    def resume_offsets_by_partition(self) -> dict[str, dict[int, int]]:
        """Per-(topic, partition) resume points — the multi-partition
        generalization (beyond the reference, which pins partition 0,
        fifo/consumer.go:59-63). Ingest parallelism at 100 TB is one
        consumer per partition; each partition's offset sequence resumes
        independently. Per-partition ORDER is still guaranteed by Kafka;
        cross-partition order is not — CDC ETL keeps the single-partition
        contract (README.md:198-199), plain ingest does not need it."""
        return {
            topic: pool.next_consumer_offsets_by_partition(topic)
            for topic, pool in self.topic_pools.items()
        }

    # -- decode + envelope -------------------------------------------------

    def decode_frame(self, frame: DataFrame) -> DataFrame:
        """kafka frame → envelope rows (fifo/consumer.go:117-148)."""
        if self.dead_letter_pool is not None:
            frame = frame.withColumn("_raw_value", F.col("value"))
        if self.format == "avro":
            if self.registry is None:
                raise ValueError("avro format needs a schema registry")
            decoded = decode_column(frame, "key", self.key_schema, self.registry)
            decoded = decode_column(decoded, "value", self.value_schema, self.registry)
        elif self.format == "json":
            decoded = frame.withColumn(
                "key", connectjson.decode(F.col("key").cast("string"), self.key_schema)
            ).withColumn(
                "value", connectjson.decode(F.col("value").cast("string"), self.value_schema)
            )
        else:
            raise ValueError(f"unknown format {self.format!r}")
        cols = [
            F.struct(
                F.col("topic"),
                F.col("partition").cast("long").alias("partition"),
                F.col("offset").cast("long").alias("offset"),
            ).alias("kafka"),
            F.col("key"),
            F.col("value"),
            F.lit(ZED_TYPE_DATA).alias("zed_type"),
        ]
        if self.dead_letter_pool is not None:
            cols.append(F.col("_raw_value"))
        env = decoded.select(*cols)
        if self.shaper:
            # decorations the shaper declares (cast-to-named on nested
            # paths) ride to the pools' types.json with each commit
            self._shaper_names: dict[str, str] = {}
            env = apply_shaper(env, self.shaper,
                               names_out=self._shaper_names)
        return env

    # -- commit ------------------------------------------------------------

    def commit_batch(self, frame: DataFrame,
                     stats_out: dict | None = None) -> dict[str, int]:
        """Decode + envelope + per-pool atomic append for one micro-batch.

        Replay guard: offsets below a pool's per-(topic, partition) resume
        point are duplicates — a checkpoint replay after a crash that
        committed SOME topics' loads but not others redelivers the whole
        batch. Unlike the reference (which errors, fifo/consumer.go:117-122
        — it has no replaying checkpoint to be safe against), duplicates
        are FILTERED so the replay completes the partial batch
        idempotently instead of wedging the stream. Returns rows per
        topic (post-filter).

        `stats_out` (round 10, the §18.1 phase-decomposition method):
        receives sec_resume (pool manifest reads for the replay guard),
        sec_decode (decode+filter materialization — ends at the presence
        collect, the action that populates the cache) and sec_load (the
        per-topic pool commits: write + manifest publish), so a
        cold-vs-warm gap is attributable from the stats alone."""
        import time as _time

        _t0 = _time.perf_counter()
        env = self.decode_frame(frame)
        if self.dead_letter_pool is not None:
            # decode-failure routing: a non-null wire value that decoded
            # to null is malformed. It goes to the dead-letter pool with
            # its raw bytes (zed_type='dlq') instead of poisoning the
            # stream (the reference has no such path; a bad record fails
            # the run). Forward progress comes from the streaming
            # checkpoint; on an out-of-band restart from pool state a
            # trailing bad record may be re-routed to the DLQ (duplicate
            # dead letters, never lost or double-committed data). The
            # guard below runs on the surviving rows only, so re-fetched
            # bad offsets cannot trip it. Flagging is a per-row
            # predicate, no extra pass.
            bad = F.col("value").isNull() & F.col("_raw_value").isNotNull()
            dead = env.filter(bad).select(
                "kafka", F.col("_raw_value").alias("raw_value"),
                F.lit("dlq").alias("zed_type"),
            )
            self.dead_letter_pool.load(dead, "from-kafka dead-letter")
            env = env.filter(~bad).drop("_raw_value")
        _t1 = _time.perf_counter()
        resume = self.resume_offsets_by_partition()
        _t2 = _time.perf_counter()
        # drop already-committed offsets (checkpoint replay after a
        # partial multi-topic commit): one map-side filter against the
        # per-(topic, partition) resume points
        bounds = [
            x
            for topic, parts in resume.items()
            for p, saved in parts.items()
            for x in (F.lit(f"{topic}#{p}"), F.lit(saved).cast("long"))
        ]
        if bounds:
            saved_map = F.create_map(*bounds)
            tp = F.concat_ws(
                "#", F.col("kafka.topic"), F.col("kafka.partition").cast("string")
            )
            env = env.filter(
                F.col("kafka.offset") >= F.coalesce(saved_map[tp], F.lit(0))
            )
        # one materialization: the DLQ load, the presence aggregation, and
        # each per-topic load all reuse the decoded batch instead of
        # re-running decode+shaper per action
        env = env.persist()
        try:
            # topic -> row count: presence AND the per-topic counts the
            # loads below would otherwise recompute with their own jobs
            # (round 11 — Pool.load(rows=); the filter below selects
            # exactly the slice this aggregation counted)
            present = {
                r["t"]: int(r["n"])
                for r in env.groupBy(F.col("kafka.topic").alias("t"))
                .agg(F.count("*").alias("n"))
                .collect()
            }
            _t3 = _time.perf_counter()
            if stats_out is not None:
                stats_out["sec_resume"] = round(_t2 - _t1, 3)
                stats_out["sec_decode"] = round(
                    (_t1 - _t0) + (_t3 - _t2), 3)
            committed: dict[str, int] = {}
            for topic, pool in self.topic_pools.items():
                if topic not in present:
                    continue
                part = env.filter(F.col("kafka.topic") == topic)
                committed[topic] = pool.load(
                    part, f"from-kafka {topic}",
                    type_names=getattr(self, "_shaper_names", None),
                    rows=present[topic])
                if stats_out is not None:
                    stats_out["sec_load"] = round(
                        stats_out.get("sec_load", 0.0)
                        + (_time.perf_counter() - _t3), 3)
                    _t3 = _time.perf_counter()
                # maintenance policy: every N delta commits, fold the pool
                # into a base manifest so streaming ingest (one small commit
                # per trigger) cannot accrete an unbounded small-file set.
                # The loop is this pool's only writer, so the compaction's
                # ConcurrentWriteError path cannot trip here.
                if (
                    self.auto_compact_every
                    and pool.commits_since_base() >= self.auto_compact_every
                ):
                    pool.compact(message="auto-compact")
        finally:
            env.unpersist()
        if committed:
            from zync_spark.streaming import incremental as inc

            for spec, dest, topics in self.rollups:
                if any(t in committed for t in topics):
                    inc.sync(self.topic_pools[topics[0]], dest, spec, list(topics))
            for spec, dest, topics in self.indexes:
                if any(t in committed for t in topics):
                    from zync_spark.streaming import (ann_index, dedup_index,
                                                      embdedup_index,
                                                      span_index, text_index)

                    if isinstance(spec, dedup_index.DedupIndexSpec):
                        sync = dedup_index.sync_index
                    elif isinstance(spec, text_index.TextIndexSpec):
                        sync = text_index.sync_text
                    elif isinstance(spec, span_index.SpanIndexSpec):
                        sync = span_index.sync_spans
                    elif isinstance(spec, embdedup_index.EmbDedupIndexSpec):
                        sync = embdedup_index.sync_embdedup
                    else:
                        sync = ann_index.sync_ann
                    # the same small-files cadence commit_batch applies to
                    # ingest pools: without it, one un-clustered commit
                    # accretes per micro-batch and the bounded-probe
                    # contract silently degrades to full index reads
                    sync(self.topic_pools[topics[0]], dest, spec,
                         list(topics),
                         auto_compact_every=self.auto_compact_every,
                         upsert=self.upsert_indexes)
            if self.indexes and self.health_every:
                self._batches_since_health += 1
                if self._batches_since_health >= self.health_every:
                    self._batches_since_health = 0
                    self._run_health_checks()
        return committed

    def _run_health_checks(self) -> list[dict]:
        """One health pass over every index entry (see __init__ note),
        then one RETENTION pass per distinct index POOL (round 7:
        check_pool_health — masked-fraction / live-tombstone thresholds
        → fold_compact + optional vacuum). Returns the verdicts (tests
        hook this directly)."""
        import json as _json
        import warnings

        from zync_spark.pool import ConcurrentWriteError
        from zync_spark.streaming import (ann_index, dedup_index,
                                          embdedup_index, health,
                                          span_index, text_index)
        from zync_spark.streaming.tombstones import fold_compact

        verdicts = []
        for i, (spec, dest, topics) in enumerate(list(self.indexes)):
            if isinstance(spec, dedup_index.DedupIndexSpec):
                check, rebuild = health.check_dedup_health,                     dedup_index.rebuild_index
            elif isinstance(spec, text_index.TextIndexSpec):
                check, rebuild = health.check_text_health,                     text_index.rebuild_text
            elif isinstance(spec, span_index.SpanIndexSpec):
                check, rebuild = health.check_span_health,                     span_index.rebuild_spans
            elif isinstance(spec, embdedup_index.EmbDedupIndexSpec):
                check, rebuild = health.check_embdedup_health,                     embdedup_index.rebuild_embdedup
            else:
                check, rebuild = health.check_ann_health,                     ann_index.rebuild_ann
            try:
                # empty index: nothing to measure yet. A spec-drift
                # ValueError (from _check_meta) PROPAGATES — skipping it
                # would silently bless a misconfigured maintainer
                # (round-6 ADVICE).
                v = check(dest, spec,
                          **self.health_opts.get(spec.name, {}))
            except health.EmptyIndexError:
                continue
            verdicts.append(v)
            if v["healthy"]:
                # a later healthy verdict clears the no-improvement
                # cooldowns: the index recovered (organic growth, manual
                # fix), so a future degradation may rebuild again
                self._applied_rebuilds.pop(spec.name, None)
                self._occ_results.pop(spec.name, None)
                continue
            warnings.warn(
                f"index {spec.name!r} unhealthy: {_json.dumps(v)}",
                stacklevel=2)
            if not self.auto_rebuild or v.get("rebuild_args") is None:
                continue
            args_key = _json.dumps(v["rebuild_args"], sort_keys=True)
            if self._applied_rebuilds.get(spec.name) == args_key:
                # no-improvement cooldown (round-6 ADVICE): we already
                # applied EXACTLY this cure and the verdict is still
                # unhealthy — the workload structurally can't clear the
                # threshold, so re-running the same O(corpus) rebuild
                # every cadence would burn the cluster for nothing.
                # A DIFFERENT recommendation (e.g. a larger prefix_len
                # as the index grows) still applies.
                warnings.warn(
                    f"index {spec.name!r}: rebuild {args_key} already "
                    "applied without clearing the threshold — cooldown; "
                    "tune health_opts or re-ingest", stacklevel=2)
                continue
            prev_max = self._occ_results.get(spec.name)
            if (prev_max
                    and "n_cells" in v["rebuild_args"]
                    and v.get("max_cell_occupancy") is not None
                    and v["max_cell_occupancy"] <= prev_max * 1.25
                    and v.get("mean_ok") is True):
                # occupancy no-improvement cooldown (round 10): the last
                # occupancy rebuild LEFT max occupancy at prev_max — it
                # did not cure the fat cell — and the verdict's max is
                # essentially unchanged since (<= 1.25x: no material
                # growth, just the same skew re-measured). rec_cells
                # drifting with N makes args_key useless here; gate on
                # the measured outcome instead. Real growth past the
                # band re-arms the rebuild — and so does a MEAN breach
                # (mean_ok False: uniform fattening is a DIFFERENT
                # failure a resize would cure, so the cooldown applies
                # only while the skew gate is the whole verdict —
                # round-10 ADVICE).
                warnings.warn(
                    f"index {spec.name!r}: last occupancy rebuild left "
                    f"max_cell_occupancy={prev_max} and it is now "
                    f"{v['max_cell_occupancy']} — the quantizer geometry "
                    "caps what a resize can buy on this corpus; cooldown "
                    "(tune max_balance/max_mean_occupancy, or accept the "
                    "skew)", stacklevel=2)
                continue
            kwargs = dict(v["rebuild_args"])
            so: dict = {}
            if isinstance(spec, (embdedup_index.EmbDedupIndexSpec,)) or \
                    rebuild is ann_index.rebuild_ann:
                kwargs["stats_out"] = so
            new = rebuild(dest, spec, **kwargs)
            self._applied_rebuilds[spec.name] = args_key
            if "n_cells" in v["rebuild_args"] and so.get(
                    "max_cell_occupancy") is not None:
                self._occ_results[spec.name] = so["max_cell_occupancy"]
                max_bal = self.health_opts.get(spec.name, {}).get(
                    "max_balance", 8.0)
                bal = so.get("cell_balance") or 1.0
                if bal > max_bal:
                    # the useless-rebuild signal, surfaced IMMEDIATELY
                    # (round-10 ask #1a): mean landed at target but the
                    # retrained quantizer is still skewed
                    warnings.warn(
                        f"index {spec.name!r}: rebuild finished with "
                        f"cell_balance={bal} (> {max_bal:g}) — "
                        f"max_cell_occupancy={so['max_cell_occupancy']} "
                        f"across {so.get('cells_used')} cells; the "
                        "corpus has fewer separable modes than cells, "
                        "so further resizes will not reduce per-pass "
                        "cost", stacklevel=2)
            # span/text/dedup rebuilds return the NEW spec contract
            # (prefix_len changed); ann returns a row count and the
            # spec is unchanged
            if new is not None and not isinstance(new, int):
                self.indexes[i] = (new, dest, topics)

        # Retention pass: one check per distinct POOL (multi-tenant
        # pools fold all co-tenant families in the one compaction they
        # were paying anyway — fold_tombstones is family-agnostic).
        pools: dict[str, tuple] = {}
        for spec, dest, _topics in self.indexes:
            pools.setdefault(dest.path, (dest, []))[1].append(spec)
        pool_opts = dict(self.health_opts.get("pool", {}))
        # the dict is documented as arbitrary check_pool_health kwargs —
        # an explicit vacuum_after_s in it must override the loop-level
        # knob, not TypeError the ingest loop (round-7 review)
        vacuum_s = pool_opts.pop("vacuum_after_s", self.auto_vacuum_s)
        for dest, specs in pools.values():
            try:
                v = health.check_pool_health(
                    dest, vacuum_after_s=vacuum_s, **pool_opts)
            except health.EmptyIndexError:
                continue
            verdicts.append(v)
            if v["healthy"]:
                continue
            warnings.warn(
                f"index pool {dest.path} needs retention maintenance: "
                f"{_json.dumps(v)}", stacklevel=2)
            if not self.auto_rebuild:
                continue
            try:
                fold_compact(dest, specs=specs,
                             message="health fold-compact")
            except ConcurrentWriteError:
                continue  # another writer landed mid-rewrite: next cadence
            if self.auto_vacuum_s is not None:
                dest.vacuum(retention_s=self.auto_vacuum_s)
        return verdicts

    # -- streaming entry ---------------------------------------------------

    def run(self, config: dict | None = None, thresh: int = 1_048_576,
            interval: str = "5 seconds", exit_after: bool = False,
            frame: DataFrame | None = None, checkpoint: str | None = None,
            partitions: dict[str, int] | None = None):
        """Start the Structured Streaming sync.

        thresh/interval are the reference's -thresh/-interval commit bounds
        (cmd/zync/from-kafka/command.go:79-82). The source is pluggable:
        by default the kafka connector (resuming from the pools' committed
        offsets via startingOffsets); pass `frame` to run the same loop
        over any streaming kafka-frame (e.g. sources.filequeue.FileQueue
        for broker-less dev/test — there the streaming checkpoint carries
        the resume point, so pass `checkpoint` too).

        `partitions` declares each topic's partition count for
        multi-partition resume (beyond the reference's pinned partition 0):
        every declared partition resumes from its pool high-water mark, or
        earliest (-2) if the pool has no state for it. Without
        `partitions`, the single-partition CDC contract applies."""
        if frame is None:
            if not kafka_available(self.spark):
                raise RuntimeError(
                    "spark-sql-kafka connector not on the classpath; "
                    "add org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
                )
            # Always build per-partition starting offsets: known partitions
            # resume at their stored cursor, partitions we haven't seen yet
            # (or beyond the declared count) start at -2 (earliest) and rely
            # on the replay filter in commit_batch for dedup. The old
            # partition-0-only shape made Spark's specific-offset
            # startingOffsets reject or mis-start unlisted partitions.
            by_part = self.resume_offsets_by_partition()
            starting = {}
            for t in self.topic_pools:
                known = by_part.get(t, {})
                n = max(partitions.get(t, 1) if partitions else 1,
                        max(known, default=-1) + 1)
                starting[t] = {str(p): known.get(p, -2) for p in range(n)}
            frame = read_stream(self.spark, config or {}, list(self.topic_pools),
                                starting, max_offsets_per_trigger=thresh)
        frame = frame.selectExpr(
            "topic", "partition", "CAST(offset AS LONG) offset", "key", "value"
        )
        writer = frame.writeStream.foreachBatch(
            lambda df, _id: self.commit_batch(df)
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if exit_after:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=interval)
        return writer.start()


def apply_shaper(env: DataFrame, shaper_src: str,
                 names_out: dict[str, str] | None = None) -> DataFrame:
    """Apply a shaper to each envelope batch (cli/shaper.go:8-22, applied
    through the embedded engine at fifo/lake.go:94-106).

    The reference accepts an arbitrary Zed program here; `zedpipe` compiles
    the full pipeline surface (where/yield/cut/put/drop/sort/head/summarize
    …, SURVEY §2.2-§2.8) to a DataFrame plan, so bare filters, assignment
    lists, and multi-stage programs like the documented README.md:78 example
    all run unchanged — JVM-side, never per-row Python. `names_out`
    collects nested named-type decorations the shaper declares
    (zedpipe.compile_pipeline) for the ingest loop to persist per pool.
    """
    from zync_spark.zedpipe import compile_pipeline

    return compile_pipeline(env, shaper_src.strip(), names_out=names_out)
