"""Generic single-pass column profiler for ANY DataFrame schema — the
`SUMMARIZE` of this engine. One scan computes every leaf column's
row/non-null/distinct counts and min/max together (one global
multi-aggregate, no per-column rescans), then the tiny stats row unpivots
into one output row per column.

Struct fields are profiled as dotted leaf paths (the envelope model makes
nested kafka/key/value structs the norm); arrays profile whole-value;
maps are not orderable/hashable in an aggregate, so they get counts only.
The oracle-pinned fixed-schema twin is queries.q_profile; this module is
the generic utility behind the CLI `profile` subcommand.

At 100 TB: cost is the one scan (all columns read — profiling is the one
workload that genuinely wants every column) plus K tiny aggregate
buffers; count_distinct is exact and therefore shuffles one hash per
distinct value per column — for very-high-cardinality columns at extreme
scale, swap in approx_count_distinct via `exact=False`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    MapType,
    NumericType,
    StructType,
)


def _leaves(schema: StructType, prefix: str = "") -> list[tuple[str, DataType]]:
    out: list[tuple[str, DataType]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(_leaves(f.dataType, prefix=f"{path}."))
        else:
            out.append((path, f.dataType))
    return out


def _orderable(dt: DataType) -> bool:
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    return True


def profile(df: DataFrame, columns: list[str] | None = None,
            exact: bool = True) -> DataFrame:
    """One row per leaf column: (col, n_rows, n_nonnull, n_distinct,
    min_v, max_v, p50, p95) with values stringified for the uniform
    schema. `columns` restricts to the given dotted paths; `exact=False`
    uses HLL++ approx_count_distinct for the distinct counts. p50/p95
    are populated for numeric leaves only, via the mergeable
    percentile_approx sketch (rank error <= 1/2500 — distribution
    monitoring never needs a global sort; the sketch's rank-error
    contract itself is oracle-pinned by queries.q_approx_quantile)."""
    leaves = _leaves(df.schema)
    if columns is not None:
        want = set(columns)
        leaves = [(p, t) for p, t in leaves if p in want]
        missing = want - {p for p, _ in leaves}
        if missing:
            raise ValueError(f"profile: no such leaf columns {sorted(missing)}")
    if not leaves:
        raise ValueError("profile: nothing to profile")

    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, (path, dt) in enumerate(leaves):
        c = F.col(path)
        aggs.append(F.count(c).alias(f"nn_{i}"))
        if _orderable(dt):
            aggs.append(distinct(c).alias(f"nd_{i}"))
            aggs.append(F.min(c).cast("string").alias(f"mi_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"ma_{i}"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"nd_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"mi_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"ma_{i}"))
        if isinstance(dt, NumericType):
            q = F.percentile_approx(
                c, F.array(F.lit(0.5), F.lit(0.95)), F.lit(2500))
            aggs.append(q[0].cast("string").alias(f"p50_{i}"))
            aggs.append(q[1].cast("string").alias(f"p95_{i}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"p50_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"p95_{i}"))
    stats = df.agg(*aggs)

    # struct-array explode (not a stack() SQL string: column names need no
    # escaping this way, and the row count is K, so explode cost is nil)
    per_col = F.array(
        *[
            F.struct(
                F.lit(path).alias("col"),
                F.col("__n").alias("n_rows"),
                F.col(f"nn_{i}").alias("n_nonnull"),
                F.col(f"nd_{i}").alias("n_distinct"),
                F.col(f"mi_{i}").alias("min_v"),
                F.col(f"ma_{i}").alias("max_v"),
                F.col(f"p50_{i}").alias("p50"),
                F.col(f"p95_{i}").alias("p95"),
            )
            for i, (path, _) in enumerate(leaves)
        ]
    )
    return stats.select(F.explode(per_col).alias("p")).select("p.*")
