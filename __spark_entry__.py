"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``zync_spark/queries.py`` — one entry per
operator from SURVEY.md §2 plus the LLM-pipeline operators; this module is
a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zync_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the engine's signature pipeline in one Catalyst plan —
    envelope construction ({kafka:{topic,partition,offset},key,value},
    fifo/consumer.go:117-148) → done-marker anti-join (etl/build.go:111-116)
    → switch-case routing (etl/build.go:92-107) → per-topic window-function
    offset assignment (replacing etl/pipeline.go:127-164's driver loop) →
    grouped summary. Read-only over sf0.001 events."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = _q.T(spark, "/root/testdata/sf0.001", "events")
    env = ev.select(
        F.struct(
            F.col("event_type").alias("topic"),
            F.lit(0).cast("long").alias("partition"),
            F.col("event_id").cast("long").alias("offset"),
        ).alias("kafka"),
        F.struct(F.col("user_id").alias("id")).alias("key"),
        F.struct(F.col("value").alias("v"), F.col("ts").alias("ts")).alias("value"),
    )
    done = env.filter(F.col("kafka.offset") % 7 == 0).select(
        F.col("kafka.topic").alias("d_topic"), F.col("kafka.offset").alias("d_offset")
    )
    pending = env.join(
        done,
        (F.col("kafka.topic") == F.col("d_topic"))
        & (F.col("kafka.offset") == F.col("d_offset")),
        "left_anti",
    )
    routed = pending.withColumn(
        "route",
        F.when(F.col("value.v") >= 10.0, F.lit("hot")).otherwise(F.lit("cold")),
    )
    w = Window.partitionBy("kafka.topic").orderBy("kafka.offset")
    assigned = routed.withColumn(
        "out_offset", (F.row_number().over(w) - 1).cast("long")
    )
    return (
        assigned.groupBy(F.col("kafka.topic").alias("topic"), "route")
        .agg(
            F.count("*").alias("n"),
            F.max("out_offset").alias("max_out_offset"),
            F.sum(F.col("value.v").cast("decimal(12,2)")).cast("double").alias("total_v"),
        )
        .orderBy("topic", "route")
    )


def _round_number() -> int:
    """Current build round, inferred from the driver's own artifacts:
    CORRECTNESS_r{N}.json files accumulate one per completed round, so
    the round about to run is max(N)+1. 0 when none exist (round 1 or a
    bare checkout) — rotation then starts at the catalog head."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [int(m.group(1)) for f in os.listdir(here)
              if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
    return (max(rounds) + 1) if rounds else 0


def _rotated(d: dict) -> dict:
    """Sample-rotation ordering metadata (round-11, VERDICT r10 ask #6):
    the driver samples ~50 of the catalog's entries per round, and a
    stable ordering left ~112 entries never driver-sampled. Rotating the
    iteration order by 50*round (mod catalog size) means a head-biased
    sampler covers every entry within ceil(n/50) ≈ 4 rounds. Contents
    are IDENTICAL either way — only dict iteration order changes, and a
    sampler that ignores order is unaffected."""
    # one canonical rotation for BOTH dicts (oracle_sql's storage order
    # differs from QUERIES'): rotate the catalog key list, then keep
    # whichever keys this dict actually has — a head-biased sampler then
    # sees matched (query, oracle) pairs in the same rotated order
    keys = [k for k in _q.QUERIES if k in d]
    keys += [k for k in d if k not in _q.QUERIES]
    if not keys:
        return dict(d)
    off = (50 * _round_number()) % len(keys)
    return {k: d[k] for k in keys[off:] + keys[:off]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(_q.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(_q.ORACLE_SQL))
