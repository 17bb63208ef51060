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
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master or not os.environ.get("SPARK_MASTER"):
        builder = builder.master(master or f"local[{cpus}]")
    return builder.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
