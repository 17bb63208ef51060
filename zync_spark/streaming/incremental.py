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

Crash safety / exactly-once: the partial rows and the advanced cursor are
committed in ONE manifest (`Pool.load(cursors=...)`), the same durability
argument as the reference's done markers (README.md:447-455). A sync that
crashes before publishing leaves no partials and no cursor advance; the
rerun re-reads the same delta.

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


def sync(src: Pool, dest: Pool, spec: RollupSpec, topics: list[str],
         message: str | None = None) -> int:
    """One incremental maintenance pass: aggregate source rows at or above
    the stored cursor and commit the partials + advanced cursors
    atomically. Returns the number of partial rows appended (0 = no new
    data; reruns are no-ops)."""
    cursors = dest.stored_cursors()
    bounds = {t: int(cursors.get(t, 0)) for t in topics}
    df = src.scan(lower_bounds=bounds)
    if df is None:
        return 0
    pred = functools.reduce(
        or_,
        [
            (F.col("kafka.topic") == t) & (F.col("kafka.offset") >= b)
            for t, b in bounds.items()
        ],
    )
    delta = df.filter(pred)
    if "zed_type" in delta.columns:
        delta = delta.filter(F.col("zed_type") == "data")
    # Two small jobs share the delta scan (cursor hi-water + partials);
    # the delta is new-data-sized, so caching it is bounded by one batch.
    delta = delta.persist()
    try:
        hi = {
            r["t"]: int(r["mx"])
            for r in delta.groupBy(F.col("kafka.topic").alias("t"))
            .agg(F.max(F.col("kafka.offset")).alias("mx"))
            .collect()
        }
        if not hi:
            return 0
        new_cursors = {
            t: (hi[t] + 1 if t in hi else bounds[t]) for t in topics
        }
        env = spec._envelope(spec.partial_agg(delta))
        return dest.load(env, message or f"{spec.topic} sync", cursors=new_cursors)
    finally:
        delta.unpersist()


def view(dest: Pool, spec: RollupSpec) -> DataFrame | None:
    """The rollup's current value: merge all committed partials for this
    spec. Never reads the fact pool."""
    df = dest.scan()
    if df is None:
        return None
    partials = df.filter(
        (F.col("zed_type") == "partial") & (F.col("kafka.topic") == spec.topic)
    )
    return spec.merge_agg(partials)


def fold(dest: Pool, spec: RollupSpec, **compact_kw) -> int:
    """Collapse this rollup's accumulated partials into one merged partial
    set, inside an ordinary compaction pass (OCC-protected base manifest).
    Other record types and other rollups in the pool pass through
    untouched. view() is invariant across fold()."""

    def _merge(df: DataFrame) -> DataFrame:
        mine = (F.col("zed_type") == "partial") & (
            F.col("kafka.topic") == spec.topic
        )
        merged = spec._envelope(spec.merge_agg(df.filter(mine)))
        return merged.unionByName(df.filter(~mine), allowMissingColumns=True)

    return dest.compact(transform=_merge,
                        message=f"{spec.topic} fold", **compact_kw)
