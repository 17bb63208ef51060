"""Incremental materialized rollups over pools: cursor-bounded delta scan →
mergeable partial aggregates appended to a summary pool → merge-on-read
view → periodic fold into a single compacted state.

The reference planned exactly this access pattern — "later we can
range-limit the scans based on the cursor" (etl/build.go:9-18,
README.md:370-382) — but always rescanned whole pools. Here every sync
costs O(new data): `Pool.committed_files` prunes whole commits below the
cursor at the manifest level, parquet row-group stats prune within files
(data is offset-sorted at write time), and the state appended per sync is
bounded by the key cardinality, never the fact-data size.

Crash safety / exactly-once: the partial rows and the advanced cursors are
committed in ONE manifest (`Pool.load(cursors=...)`), the same durability
argument as the reference's done markers (README.md:447-455). A sync that
crashes before publishing leaves no partials and no cursor advance; the
rerun re-reads the same delta. Against CONCURRENT syncs the publish is
compare-and-set (`occ_token`): of two racers over the same delta exactly
one commits, the other aborts with ConcurrentWriteError and re-runs —
double-counting is impossible. Cursors are tracked per (spec, topic,
partition): several rollups share one summary pool without interference,
and multi-partition topics (per-partition offset sequences) resume each
partition independently, new partitions starting at 0.

At 100 TB: the summary pool holds one row per (key × sync); view() merges
|keys| × |syncs| rows — millions at most — and never touches the fact
pool. fold() keeps the sync count bounded. Merge correctness requires
aggregates that form a commutative monoid: count/sum/min/max (+ sum of
squares for variance) qualify; avg/stddev are derived at view time from
the merged partials.
"""

from __future__ import annotations

import functools
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zync_spark.pool import Pool

KINDS = {"count", "sum", "min", "max", "sum_sq"}


class RollupSpec:
    """Declarative rollup definition.

    `name` scopes the summary rows inside the destination pool (they are
    enveloped under kafka.topic = 'rollup:<name>' with zed_type='partial',
    so one pool can host several rollups alongside ordinary data — the
    same heterogeneous-pool design as done markers, SURVEY §1.2).

    `keys`: {output column: SQL expression over the source rows}.
    `aggs`: [(output column, kind, SQL expression)] with kind one of
    count/sum/min/max/sum_sq ('count' with expr None counts rows).
    """

    def __init__(self, name: str, keys: dict[str, str],
                 aggs: list[tuple[str, str, str | None]]):
        self.name = name
        self.topic = f"rollup:{name}"
        self.keys = dict(keys)
        self.aggs = list(aggs)
        for out, kind, expr in self.aggs:
            if kind not in KINDS:
                raise ValueError(f"agg {out}: unknown kind {kind!r}")
            if expr is None and kind != "count":
                raise ValueError(f"agg {out}: kind {kind!r} needs an expression")

    # -- the two halves of the monoid --------------------------------------

    def partial_agg(self, df: DataFrame) -> DataFrame:
        """Per-delta partial aggregation (map-side of the lifetime agg)."""
        gcols = [F.expr(src).alias(out) for out, src in self.keys.items()]
        exprs = []
        for out, kind, src in self.aggs:
            if kind == "count":
                c = F.count(F.expr(src)) if src else F.count("*")
            elif kind == "sum":
                c = F.sum(F.expr(src))
            elif kind == "min":
                c = F.min(F.expr(src))
            elif kind == "max":
                c = F.max(F.expr(src))
            else:  # sum_sq
                c = F.sum(F.expr(src) * F.expr(src))
            exprs.append(c.alias(out))
        return df.groupBy(*gcols).agg(*exprs)

    def merge_agg(self, partials: DataFrame) -> DataFrame:
        """Combine partials across syncs (reduce-side; associative +
        commutative, so any grouping of syncs merges to the same state)."""
        merge = {"count": F.sum, "sum": F.sum, "sum_sq": F.sum,
                 "min": F.min, "max": F.max}
        exprs = [merge[kind](F.col(out)).alias(out) for out, kind, _ in self.aggs]
        return partials.groupBy(*self.keys).agg(*exprs)

    def _envelope(self, partial: DataFrame) -> DataFrame:
        """Wrap partial rows in the pool envelope. Offsets are a
        deterministic row_number within the commit (partials are unordered
        state — the view never reads offsets — but offset-sorted files keep
        Pool.load's stats/clustering path uniform). The single-partition
        window sort is bounded by key cardinality, not data size."""
        w = Window.orderBy(*[F.col(k) for k in self.keys])
        cols = list(self.keys) + [out for out, _, _ in self.aggs]
        return partial.select(
            F.struct(
                F.lit(self.topic).alias("topic"),
                F.lit(0).cast("long").alias("partition"),
                (F.row_number().over(w) - 1).cast("long").alias("offset"),
            ).alias("kafka"),
            F.lit("partial").alias("zed_type"),
            *[F.col(c) for c in cols],
        )


def _ckey(spec: RollupSpec, topic: str, partition: int) -> str:
    # Cursor keys are namespaced per spec (several rollups can share one
    # summary pool without clobbering each other) and per partition
    # (Kafka offsets are per-partition sequences — a topic-level max
    # would silently drop rows from lagging partitions).
    return f"{spec.topic}|{topic}#{partition}"


def _spec_cursors(spec: RollupSpec, stored: dict[str, int],
                  topics: list[str]) -> dict[str, dict[int, int]]:
    out: dict[str, dict[int, int]] = {t: {} for t in topics}
    prefix = f"{spec.topic}|"
    for k, v in stored.items():
        if not k.startswith(prefix):
            continue
        t, _, p = k[len(prefix):].rpartition("#")
        if t in out:
            out[t][int(p)] = int(v)
    return out


def scan_delta(src: Pool, cursors: dict[str, dict[int, int]],
               topics: list[str]) -> DataFrame | None:
    """Cursor-bounded delta: data rows at or above the per-(topic,
    partition) cursors. Manifest-level pruning happens in Pool.scan
    (lower_bounds); the residual predicate resumes known partitions at
    their cursor and defaults NEW partitions (absent from the map) to 0 —
    never dropped. Shared by every incremental maintainer (rollups,
    dedup index)."""
    df = src.scan(lower_bounds={t: parts for t, parts in cursors.items()})
    if df is None:
        return None
    preds = []
    for t in topics:
        parts = cursors.get(t, {})
        topic_pred = F.col("kafka.topic") == t
        if parts:
            bound_map = F.create_map(
                *[x for p, b in parts.items()
                  for x in (F.lit(p).cast("long"), F.lit(b).cast("long"))]
            )
            topic_pred = topic_pred & (
                F.col("kafka.offset")
                >= F.coalesce(bound_map[F.col("kafka.partition")], F.lit(0))
            )
        preds.append(topic_pred)
    delta = df.filter(functools.reduce(or_, preds))
    if "zed_type" in delta.columns:
        # Null-safe: rows null-padded by schema widening (committed before
        # a zed_type column existed) are data, not markers — matching the
        # eqNullSafe treatment in _is_mine() and Pool.compact().
        delta = delta.filter(
            F.col("zed_type").isNull() | (F.col("zed_type") == "data")
        )
    return delta


def sync(src: Pool, dest: Pool, spec: RollupSpec, topics: list[str],
         message: str | None = None) -> int:
    """One incremental maintenance pass: aggregate source rows at or above
    the stored per-(topic, partition) cursors and commit the partials +
    advanced cursors atomically. Returns the number of partial rows
    appended (0 = no new data; reruns are no-ops).

    Concurrency: the commit is published compare-and-set at the commit-log
    length this sync read its cursors at (Pool.load occ_token). Two
    concurrent syncs over the same delta can therefore never BOTH commit
    (which would double-count); the loser gets ConcurrentWriteError and
    simply re-runs against the advanced cursor."""
    snapshot = len(dest.commits())
    cursors = _spec_cursors(spec, dest.stored_cursors(), topics)
    delta = scan_delta(src, cursors, topics)
    if delta is None:
        return 0
    # Two small jobs share the delta scan (cursor hi-water + partials);
    # the delta is new-data-sized, so caching it is bounded by one batch.
    delta = delta.persist()
    try:
        new_cursors = {
            _ckey(spec, r["t"], int(r["p"])): int(r["mx"]) + 1
            for r in delta.groupBy(
                F.col("kafka.topic").alias("t"),
                F.col("kafka.partition").alias("p"),
            )
            .agg(F.max(F.col("kafka.offset")).alias("mx"))
            .collect()
        }
        if not new_cursors:
            return 0
        env = spec._envelope(spec.partial_agg(delta))
        return dest.load(env, message or f"{spec.topic} sync",
                         cursors=new_cursors, occ_token=snapshot)
    finally:
        delta.unpersist()


def view(dest: Pool, spec: RollupSpec) -> DataFrame | None:
    """The rollup's current value: merge all committed partials for this
    spec. Never reads the fact pool."""
    df = dest.scan()
    if df is None:
        return None
    partials = df.filter(_is_mine(spec))
    return spec.merge_agg(partials)


def fold(dest: Pool, spec: RollupSpec, **compact_kw) -> int:
    """Collapse this rollup's accumulated partials into one merged partial
    set, inside an ordinary compaction pass (OCC-protected base manifest).
    Other record types and other rollups in the pool pass through
    untouched. view() is invariant across fold()."""

    def _merge(df: DataFrame) -> DataFrame:
        mine = _is_mine(spec)
        merged = spec._envelope(spec.merge_agg(df.filter(mine)))
        return merged.unionByName(df.filter(~mine), allowMissingColumns=True)

    return dest.compact(transform=_merge,
                        message=f"{spec.topic} fold", **compact_kw)


def _is_mine(spec: RollupSpec):
    # Null-SAFE match: schema widening null-pads rows from commits that
    # never had zed_type/topic columns; a null-unsafe `==` would make
    # both filter(mine) and filter(~mine) drop such rows — data loss in
    # fold()'s pass-through. eqNullSafe sends them down the ~mine leg.
    return F.col("zed_type").eqNullSafe("partial") & F.col("kafka.topic").eqNullSafe(
        spec.topic
    )


def load_rollup_spec(path: str) -> tuple[RollupSpec, dict]:
    """Parse a rollup spec YAML (the CLI's one format for `rollup` and
    `from-kafka --rollup`); returns (spec, raw_doc) — the doc carries the
    routing fields (source/dest/topics) the caller resolves to pools."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    spec = RollupSpec(
        doc["name"],
        keys=dict(doc["keys"]),
        aggs=[(a["col"], a["kind"], a.get("expr")) for a in doc["aggs"]],
    )
    return spec, doc
