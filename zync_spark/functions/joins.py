"""Temporal join operators: as-of join and bucketed interval (range) join.

The reference has neither (SURVEY §2.3 notes only anti + inner equi-join),
but any event-stream lake grows these needs immediately; they are
first-class here as beyond-reference operators.

Scale design:

- `asof_join` does NOT generate per-pair candidates (the naive
  `l JOIN r ON key AND r.t <= l.t` + max_by explodes quadratically within
  hot keys). Instead both sides union into one stream, partitioned by key
  and ordered by time, and a running `last(right_payload, ignorenulls)`
  window carries the newest right row forward onto each left row. Cost:
  ONE shuffle on the join key + a sort within partitions — linear, spill-
  safe, and skew is bounded by the busiest single key.

- `interval_join` avoids BroadcastNestedLoopJoin (the Catalyst fallback
  for pure range predicates) by bucketing time into `bucket` buckets and
  equi-joining on (key, bucket): each interval registers in the buckets it
  overlaps (bounded fanout = len/bucket + 1), each point probes exactly
  one bucket, and the exact range predicate filters residuals after the
  hash join. Bucket width should be on the order of the interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str | None = None,
    right_alias: str = "matched",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time on the same key (backward as-of join, the
    semantics of DuckDB/pandas ASOF JOIN).

    Returns all left columns plus `right_alias`: a nullable struct of the
    matched right row (null when no prior right row exists, or the match
    is older than `tolerance_seconds`).
    """
    right_time = right_time or left_time
    keys = [on] if isinstance(on, str) else list(on)

    lf = left.select(
        F.struct(*left.columns).alias("__l"),
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
    )
    rf = right.select(
        F.struct(*right.columns).alias("__r"),
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
    )
    # Right rows sort before left rows at equal time (tag 0 < 1) → the
    # match predicate is inclusive (<=). The trailing __r orderBy key makes
    # the winner among exact right-side ties deterministic.
    u = lf.unionByName(rf, allowMissingColumns=True)
    w = (
        Window.partitionBy(*[f"__k{i}" for i in range(len(keys))])
        .orderBy("__t", "__is_left", "__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )
    m: Column = F.col("__m")
    if tolerance_seconds is not None:
        recent = F.col("__t").cast("double") - m[right_time].cast("double") <= F.lit(
            float(tolerance_seconds)
        )
        m = F.when(m.isNotNull() & recent, m)
    return matched.select("__l.*", m.alias(right_alias))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_time: str,
    lo: str,
    hi: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with the same key and
    lo <= point_time < hi, via time-bucket equi-join (no nested loop).

    Returns point columns + interval columns (names must not collide
    except the join key[s]). `how` may be 'inner' or 'right' ('right'
    keeps unmatched intervals with null point columns).
    """
    keys = [on] if isinstance(on, str) else list(on)
    bsec = F.lit(int(bucket_seconds)).cast("long")

    def bucket_of(c: Column) -> Column:
        return F.floor(c.cast("double") / bsec).cast("long")

    p = points.withColumn("__b", bucket_of(F.col(point_time)))
    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(bucket_of(F.col(lo)), bucket_of(F.col(hi)))),
    )
    pred = (F.col(point_time) >= F.col(lo)) & (F.col(point_time) < F.col(hi))
    joined = p.join(iv, [*keys, "__b"])
    if how == "inner":
        return joined.filter(pred).drop("__b")
    if how != "right":
        raise ValueError(f"how={how!r} not supported (inner|right)")
    # right join: keep every interval exactly once even with no matching
    # point; dedupe the exploded interval copies by keying on the bucket.
    matched = joined.filter(pred).drop("__b")
    point_cols = [c for c in points.columns if c not in keys]
    iv_cols = [c for c in intervals.columns]
    missing = (
        intervals.join(
            matched.select(*iv_cols).distinct(),
            on=iv_cols,
            how="left_anti",
        )
        .select(
            *[F.lit(None).cast(points.schema[c].dataType).alias(c) for c in point_cols],
            *iv_cols,
        )
    )
    return matched.select(*point_cols, *iv_cols).unionByName(missing)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed keys: the left (big, skewed)
    side gets a deterministic salt in [0, salt) derived from xxhash64 of
    its whole row, splitting each hot key across `salt` reducers; the
    right side replicates `salt`× via explode. Result is identical to the
    plain join — salting only re-shards the shuffle.

    Use when one key dominates (AQE's skew splitting handles sort-merge
    spills, but salting also fixes the single-reducer hot partition for
    hash aggregation downstream). Right side should be the smaller input
    (it is replicated salt×).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l2 = left.withColumn("__salt", lsalt.cast("int"))
    # explode() is a generator — it cannot nest inside another expression
    # (e.g. a cast), so the sequence is already int-typed to match __salt.
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt - 1).cast("int")))
    )
    return l2.join(r2, [*keys, "__salt"], how).drop("__salt")
