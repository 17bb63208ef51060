"""SparkSession factory tuned for this engine.

Defaults are chosen for scale-out behavior (AQE on, skew-join handling on,
arrow-accelerated Python interop) while remaining correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "zync-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              adaptive: bool = True) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE enabled: runtime coalescing of shuffle partitions + skew-join
      splitting, which is how this engine survives skewed keys at 100 TB
      without hand-salting every join.
    - UTC session timezone so timestamp semantics match the parquet test
      corpus and external SQL oracles.
    - Arrow enabled for the Pandas-UDF paths (dedup/similarity/multimodal).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", str(adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Broadcast threshold stays at Spark's 10MB default (explicit here
        # so the choice is visible): 10MB of snappy parquet decompresses to
        # a 50-200MB driver-built hashmap, which is already the sensible
        # ceiling for a serialized driver build + per-executor ship. The
        # previous 64MB pin measured 20-30% SLOWER at gsf1 (1.5M-row
        # orders build side collected to the driver per query) and would
        # pin multi-GB broadcasts at 100 TB. Genuinely tiny dims (nation,
        # region, centroid tables) are far below 10MB at any scale.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # When broadcast doesn't apply, prefer shuffled-hash over
        # sort-merge: no sort on either side, parallel per-partition hash
        # build. Safe at scale because Spark only picks SHJ when the build
        # side is BOTH 3x smaller than the probe AND under
        # threshold*numShufflePartitions total (canBuildLocalHashMap), so
        # huge-x-huge joins still get sort-merge's spill behavior.
        # Measured at gsf1 (q5 shape): SHJ 1.03s vs SMJ 1.15s.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if os.environ.get("SPARK_GRAFT_NO_PROGRESS"):
        # one-line-output contexts (bench.py): console progress \r-spam
        # interleaves with the JSON line under merged-stream capture.
        # Static conf — effective only at context build, which is why it
        # rides an env var rather than a post-create conf.set
        builder = builder.config("spark.ui.showConsoleProgress", "false")
    if master or not os.environ.get("SPARK_MASTER"):
        builder = builder.master(master or f"local[{cpus}]")
    return builder.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
