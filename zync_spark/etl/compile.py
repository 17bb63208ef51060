"""Compile a transform YAML into a DataFrame pipeline and run it
transactionally against pools.

Reference pipeline shape (etl/build.go:88-138, SURVEY §3.1): per input
topic, scan raw + already-done markers and anti-join them away; route each
unprocessed record through the first matching rule (switch semantics,
etl/build.go:92-107); denorm rules inner-join two topics and graft the
right record on; every consumed input yields a `done` marker; outputs get
consecutive per-topic offsets; outputs + markers commit atomically.

Differences from the reference, by design (Spark-first):
- The reference generates a Zed program *string* and re-parses it; here the
  YAML compiles straight to a Catalyst logical plan.
- The reference assigns output offsets in a driver-side Go loop over
  ZSON strings (etl/pipeline.go:127-164); here it is a window function —
  distributed, no driver materialization.
- The reference materializes the whole update in RAM with no spill
  (etl/pipeline.go:87-91); here every join/agg is a spillable shuffle.
- Anti-join + switch + join run in ONE plan, so Catalyst can share the
  scans and push `kafka.topic` predicates into them.

Unmatched records (no rule matches / denorm row without a partner) produce
no output AND no done marker, so they are retried on the next run —
the reference's "Dan row pending" behavior (README.md:465-476).

Multi-partition CDC (round 6 — beyond the reference, which pins
partition 0, fifo/consumer.go:59-63): markers, the anti-join, cursors,
and output offset assignment are all keyed per (topic, PARTITION) —
offsets are per-partition sequences in Kafka, so (topic, offset) alone
cannot disambiguate siblings. Ordering is guaranteed WITHIN a partition
(all Kafka itself guarantees); outputs inherit their driving input's
partition, each output partition gets its own consecutive offset
sequence, and cursors persist both per-partition ("topic#p") and as the
topic-level floor ("topic" = min over partitions, which is what the
manifest pruner and pre-round-6 readers understand). With one input
partition everything degenerates to the reference's exact behavior
(golden-tested).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from zync_spark.envelope import ZED_TYPE_DATA, ZED_TYPE_DONE
from zync_spark.etl.config import Rule, Transform
from zync_spark.pool import Pool
from zync_spark.zedexpr import Context, compile_assignments, compile_expr


def _cursor_filter(cursors: dict[int, int]) -> Column:
    """Row-level cursor predicate for per-partition cursors, in the
    OR-of-ANDs form parquet pushdown understands:

        (p = p0 AND o >= c0) OR ... OR p NOT IN (known partitions)

    The trailing disjunct keeps rows of partitions with no stored cursor
    (a newly appearing partition starts at offset 0 — a flat global
    `offset >= min(cursors)` floor would silently DROP its early rows,
    so there is deliberately no such floor). With a single uniform
    cursor this degenerates to the reference-era single-bound filter."""
    if not cursors:
        return F.col("kafka.offset") >= 0
    per = [
        (F.col("kafka.partition") == int(p))
        & (F.col("kafka.offset") >= int(c))
        for p, c in sorted(cursors.items())
    ]
    pred = reduce(lambda a, b: a | b, per)
    return pred | ~F.col("kafka.partition").isin(
        [int(p) for p in cursors])


def _tp_cursors(stored: dict[str, int], topic: str) -> dict[int, int]:
    """The per-partition cursor view of one topic from the stored cursor
    dict. "topic#p" keys are per-partition (round 6) and AUTHORITATIVE:
    when any exist, the plain "topic" key is IGNORED — new runs rewrite
    it as the min-over-partitions floor, and reading a floor as
    partition 0's cursor would fabricate a bound for a partition that
    may never have produced data (a late-appearing partition 0's early
    rows would be silently skipped forever — round-6 review). Only a
    pure-legacy dict (plain key, no "#p" keys — written under the old
    single-partition contract, when partition 0 was the only legal
    producer) reads the plain key as p0's cursor."""
    out: dict[int, int] = {}
    prefix = topic + "#"
    for k, v in stored.items():
        if k.startswith(prefix):
            try:
                p = int(k.rsplit("#", 1)[1])
            except ValueError:
                continue
            out[p] = max(int(v), out.get(p, 0))
    if not out and topic in stored:
        out[0] = int(stored[topic])
    return out


class EtlPipeline:
    def __init__(self, spark: SparkSession, transform: Transform,
                 pools: dict[str, Pool]):
        """pools: pool-name → Pool for every pool named in the transform."""
        self.spark = spark
        self.t = transform
        self.pools = pools
        # out-pool → cursor-advance plan for the latest build (see
        # _build_group); collected and committed by run().
        self._cursor_plans: dict[str, DataFrame] = {}

    # -- plan construction -------------------------------------------------

    def _unprocessed(self, topic: str, out_pool: str,
                     cursors: dict[int, int] | None = None
                     ) -> DataFrame | None:
        """Raw records of `topic` minus those with done markers in the
        output pool (the anti-join of etl/build.go:111-116).

        `cursors` maps partition -> that partition's contiguous done
        prefix: the raw scan and the marker scan are both range-limited
        per partition — whole commits prune via manifest per-partition
        stats, row groups via parquet min/max, and the anti-join build
        side shrinks to the non-contiguous tail. The reference scans the
        full pool every run and flags exactly this as its missing
        optimization (etl/build.go:9-18). The anti-join keys on (topic,
        partition, offset) — offsets are per-partition sequences, so
        sibling partitions legally reuse offset numbers."""
        cursors = cursors or {}
        pool = self.pools[self.t.pool_for_topic(topic)]
        bounds = {topic: cursors} if cursors else {topic: 0}
        cfilter = _cursor_filter(cursors)
        raw = pool.scan(lower_bounds=bounds)
        if raw is None:
            return None
        raw = raw.filter(
            (F.col("kafka.topic") == topic)
            & (F.col("zed_type") == ZED_TYPE_DATA)
            & cfilter
        )
        out_state = self.pools[out_pool].scan(lower_bounds=bounds)
        if out_state is None:
            return raw
        done = (
            out_state.filter(
                (F.col("zed_type") == ZED_TYPE_DONE)
                & (F.col("kafka.topic") == topic)
                & cfilter
            )
            .select(
                F.col("kafka.topic").alias("__d_topic"),
                F.col("kafka.partition").alias("__d_part"),
                F.col("kafka.offset").alias("__d_offset"),
            )
        )
        return raw.join(
            done,
            (F.col("kafka.topic") == F.col("__d_topic"))
            & (F.col("kafka.partition") == F.col("__d_part"))
            & (F.col("kafka.offset") == F.col("__d_offset")),
            "left_anti",
        )

    def _rule_predicate(self, rule: Rule) -> Column:
        """Topic gate AND the rule's where clause, on an envelope DF."""
        if rule.type == "stateless":
            pred = F.col("kafka.topic") == rule.in_topic
        else:
            pred = F.col("kafka.topic").isin(rule.left, rule.right)
        if rule.where:
            pred = pred & compile_expr(rule.where, Context())
        return pred

    def _route(self, records: DataFrame, group: list[tuple[int, Rule]]) -> DataFrame:
        """Switch routing: tag each record with the (global) index of the
        FIRST matching rule of this output-pool group (etl/build.go:92-107
        case ordering); -1 = unmatched."""
        idx: Column = F.lit(-1)
        for i, rule in reversed(group):
            idx = F.when(self._rule_predicate(rule), F.lit(i)).otherwise(idx)
        return records.withColumn("__rule", idx)

    def _apply_projection(self, rule: Rule, roots: dict[str, Column],
                          roots_schema: dict[str, StructType]) -> Column:
        """Compile the rule's `zed: | out := {...}` (or spark_sql) snippet
        into the output record Column (struct with key/value fields)."""
        if rule.spark_sql is not None:
            return F.expr(rule.spark_sql)
        schema = StructType([StructField(k, v) for k, v in roots_schema.items()])
        assigns = compile_assignments(rule.zed, Context(roots=roots, schema=schema))
        if list(assigns) != ["out"]:
            raise ValueError(
                f"rule snippet must assign exactly `out`, got {list(assigns)}"
            )
        return assigns["out"]

    def _rule_outputs(self, i: int, rule: Rule, routed: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Returns (outputs, consumed) for one rule.

        outputs: columns __out (struct), __sort_offset, __rule, __src_topic,
        __src_offset, __out_topic. consumed: (topic, offset) pairs."""
        mine = routed.filter(F.col("__rule") == i)
        env_schema = StructType(
            [f for f in mine.schema.fields if not f.name.startswith("__")]
        )
        env_cols = [f.name for f in env_schema.fields]
        if rule.type == "stateless":
            this = F.struct(*[F.col(c) for c in env_cols])
            out_col = self._apply_projection(rule, {"in": this}, {"in": env_schema})
            outputs = mine.select(
                out_col.alias("__out"),
                F.col("kafka.offset").alias("__sort_offset"),
                F.lit(i).alias("__rule_idx"),
                F.col("kafka.topic").alias("__src_topic"),
                F.col("kafka.partition").alias("__src_part"),
                F.col("kafka.offset").alias("__src_offset"),
                F.col("kafka.offset").alias("__tie"),
                F.lit(rule.out).alias("__out_topic"),
            )
            consumed = mine.select(
                F.col("kafka.topic").alias("topic"),
                F.col("kafka.partition").alias("partition"),
                F.col("kafka.offset").alias("offset"),
            )
            return outputs, consumed

        # denorm: two-sided equi-join (etl/build.go:187-216). The reference
        # pre-sorts both sides for its merge join; Catalyst picks the
        # physical join strategy itself.
        lpath, rpath = [p.strip() for p in rule.join_on.split("=", 1)]
        lparts, rparts = lpath.split("."), rpath.split(".")
        if lparts[0] == "left":
            lparts = lparts[1:]
        if rparts[0] == "right":
            rparts = rparts[1:]
        this = F.struct(*[F.col(c) for c in env_cols])
        left = (
            mine.filter(F.col("kafka.topic") == rule.left)
            .select(this.alias("left"))
        )
        right = (
            mine.filter(F.col("kafka.topic") == rule.right)
            .select(this.alias("right"))
        )
        lkey = reduce(lambda c, p: c[p], lparts, F.col("left"))
        rkey = reduce(lambda c, p: c[p], rparts, F.col("right"))
        joined = left.join(right, lkey == rkey, "inner")
        out_col = self._apply_projection(
            rule,
            {"left": F.col("left"), "right": F.col("right")},
            {"left": env_schema, "right": env_schema},
        )
        outputs = joined.select(
            out_col.alias("__out"),
            F.col("left.kafka.offset").alias("__sort_offset"),
            F.lit(i).alias("__rule_idx"),
            F.col("left.kafka.topic").alias("__src_topic"),
            # the DRIVING (left) side's partition orders the output —
            # a cross-partition join pair lands on the left's sequence
            F.col("left.kafka.partition").alias("__src_part"),
            F.col("left.kafka.offset").alias("__src_offset"),
            # right-side offset breaks ties when one left row joins several
            # right rows — without it the window order below has duplicate
            # keys and row_number assignment is nondeterministic across
            # plan re-executions (load() evaluates the batch more than once)
            F.col("right.kafka.offset").alias("__tie"),
            F.lit(rule.out).alias("__out_topic"),
        )
        # both sides of a joined pair are consumed (etl/build.go:210-213);
        # distinct because a shared row could legally match twice
        consumed = (
            joined.select(
                F.col("left.kafka.topic").alias("topic"),
                F.col("left.kafka.partition").alias("partition"),
                F.col("left.kafka.offset").alias("offset"),
            )
            .unionByName(
                joined.select(
                    F.col("right.kafka.topic").alias("topic"),
                    F.col("right.kafka.partition").alias("partition"),
                    F.col("right.kafka.offset").alias("offset"),
                )
            )
            .distinct()
        )
        return outputs, consumed

    def _pool_groups(self) -> dict[str, list[tuple[int, Rule]]]:
        """Rules grouped by output POOL, preserving declared order — the
        reference's per-output-topic program loop (etl/build.go:66-80),
        coarsened to pools because a pool is the commit + done-marker
        scope (two output topics in one pool share one atomic commit)."""
        groups: dict[str, list[tuple[int, Rule]]] = {}
        for i, rule in enumerate(self.t.rules):
            groups.setdefault(self.t.output_pool_for_topic(rule.out), []).append((i, rule))
        return groups

    def build(self) -> tuple[DataFrame | None, DataFrame | None]:
        """Single-output-pool convenience: build (outputs, markers) for one
        ETL pass. Raises if the transform spans multiple output pools —
        use build_all() then."""
        groups = self._pool_groups()
        if len(groups) > 1:
            raise ValueError(
                f"transform spans output pools {sorted(groups)}; use build_all()"
            )
        [(pool_name, group)] = groups.items()
        return self._build_group(pool_name, group)

    def build_all(self) -> dict[str, tuple[DataFrame | None, DataFrame | None]]:
        """Build one (outputs, markers) plan per output pool."""
        return {
            pool_name: self._build_group(pool_name, group)
            for pool_name, group in self._pool_groups().items()
        }

    def _build_group(
        self, out_pool: str, group: list[tuple[int, Rule]]
    ) -> tuple[DataFrame | None, DataFrame | None]:
        """Build (outputs, markers) DataFrames for one output pool's rules.

        outputs: full output-envelope rows with assigned per-topic offsets.
        markers: done-marker envelope rows. Either may be None when there
        is nothing to do."""
        group_topics = {
            t for _, r in group for t in (r.in_topic, r.left, r.right) if t
        }
        stored = self.pools[out_pool].stored_cursors()
        scans = [
            self._unprocessed(t, out_pool, cursors=_tp_cursors(stored, t))
            for t in self.t.input_topics()
            if t in group_topics
        ]
        scans = [s for s in scans if s is not None]
        if not scans:
            return None, None
        # fuse the per-topic scans (schemas may differ across pools)
        records = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), scans
        )
        routed = self._route(records, group)

        outs, consumed = [], []
        for i, rule in group:
            o, c = self._rule_outputs(i, rule, routed)
            outs.append(o)
            consumed.append(c)
        outputs = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), outs
        )
        markers = reduce(lambda a, b: a.unionByName(b), consumed).distinct()

        # Cursor advance (persisted with the commit in run()): per
        # (topic, PARTITION), the min offset scanned-but-not-consumed
        # this run (still pending), else max scanned + 1. Safe lower
        # bound for the NEXT run's scans: everything below it either
        # carries a done marker or does not exist — the range limit of
        # etl/build.go:9-18, per partition because offsets are
        # per-partition sequences.
        scanned = records.select(
            F.col("kafka.topic").alias("t"),
            F.col("kafka.partition").alias("p"),
            F.col("kafka.offset").alias("o"),
        )
        pend = scanned.join(
            markers.select(F.col("topic").alias("t"),
                           F.col("partition").alias("p"),
                           F.col("offset").alias("o")),
            ["t", "p", "o"],
            "left_anti",
        )
        self._cursor_plans[out_pool] = (
            scanned.groupBy("t", "p")
            .agg(F.max("o").alias("mx"))
            .join(pend.groupBy("t", "p").agg(F.min("o").alias("pmin")),
                  ["t", "p"], "left")
        )

        # Per-(output-topic, partition) consecutive offsets: window
        # function over a deterministic order (driving input offset, rule
        # order, source) — replaces the reference's driver-side loop
        # (etl/pipeline.go:127-164). Outputs inherit the DRIVING input's
        # partition (ordering is per-partition, Kafka's own guarantee),
        # and each output partition gets its own offset base — two
        # partitions' sequences can never collide.
        base = self.pools[out_pool].next_producer_offsets_by_partition()
        base_map = F.create_map(
            *[F.lit(x) for kv in base.items() for x in kv]
        ) if base else None
        w = Window.partitionBy("__out_topic", "__src_part").orderBy(
            "__sort_offset", "__rule_idx", "__src_topic", "__src_offset", "__tie"
        )
        tp_key = F.concat(F.col("__out_topic"), F.lit("#"),
                          F.col("__src_part").cast("string"))
        start = (
            F.coalesce(base_map[tp_key], F.lit(0))
            if base_map is not None
            else F.lit(0)
        )
        out_env = outputs.select(
            F.struct(
                F.col("__out_topic").alias("topic"),
                F.col("__src_part").cast("long").alias("partition"),
                (start + F.row_number().over(w) - 1).cast("long").alias("offset"),
            ).alias("kafka"),
            F.col("__out.key").alias("key"),
            F.col("__out.value").alias("value"),
            F.lit(ZED_TYPE_DATA).alias("zed_type"),
        )
        marker_env = markers.select(
            F.struct(
                F.col("topic"),
                F.col("partition").cast("long").alias("partition"),
                F.col("offset").cast("long").alias("offset"),
            ).alias("kafka"),
            F.lit(ZED_TYPE_DONE).alias("zed_type"),
        )
        return out_env, marker_env

    # -- execution ---------------------------------------------------------

    def run(self, message: str = "etl") -> int:
        """One transactional ETL pass: per output pool, outputs + markers
        in a single atomic pool commit (etl/pipeline.go:92-125). Returns
        total committed row count; rerunning with no new input commits 0
        rows (idempotent, the anti-join backstop of README.md:447-455).

        The commit is compare-and-set against the output pool's commit
        log as of plan-build time (Pool.load occ_token): the pass reads
        done markers, producer offsets, and cursors from that state, so a
        concurrent commit to the SAME output pool must abort this one
        (ConcurrentWriteError; just re-run) — otherwise two racers would
        assign the same output offsets and double-process inputs. With
        several output pools, a mid-run abort leaves earlier pools
        committed; the rerun is a no-op for them (anti-join) and
        completes the rest."""
        # snapshot BEFORE build_all reads any output-pool state
        snapshots = {name: len(pool.commits()) for name, pool in self.pools.items()}
        total = 0
        for pool_name, (outputs, markers) in self.build_all().items():
            if outputs is None:
                continue
            pool = self.pools[pool_name]
            # Advance scan cursors monotonically; committed atomically with
            # outputs+markers so the bound is exactly as durable as the
            # markers it summarizes. Per-partition keys ("t#p") carry the
            # precise bounds; the plain topic key is re-written as the min
            # over that topic's partition cursors — the topic-level floor
            # manifest pruning and pre-round-6 readers understand.
            cursors = dict(pool.stored_cursors())
            plan = self._cursor_plans.get(pool_name)
            if plan is not None:
                touched: set[str] = set()
                for r in plan.collect():
                    nxt = r["pmin"] if r["pmin"] is not None else r["mx"] + 1
                    key = f"{r['t']}#{int(r['p'])}"
                    cursors[key] = max(int(nxt), cursors.get(key, 0))
                    touched.add(r["t"])
                for t in touched:
                    per = _tp_cursors(cursors, t)
                    floor = min(per.values()) if per else 0
                    cursors[t] = max(floor, 0)
            # one materialization: load() evaluates its frame for count,
            # write, and stats — persist so the anti-join/route/window DAG
            # (the most expensive plan here) runs once, not three times
            batch = outputs.unionByName(markers, allowMissingColumns=True).persist()
            try:
                total += pool.load(batch, message, cursors=cursors,
                                   occ_token=snapshots[pool_name])
            finally:
                batch.unpersist()
        return total

