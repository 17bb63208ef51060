"""Compute-parallelism guard shared by every CPU-heavy map-side pass.

The trap (SCALING §19.7, found three independent times before this
module existed): Spark's scan split math is IO-optimal — a small delta
or a freshly compacted 8-file base arrives in one or a few partitions,
which is exactly right for reading bytes and exactly wrong for an
O(cost-per-row) compute pass (tokenize/shingle/md5, k x dim nearest-cell
assignment, rolling-window hashing, PQ reconstruction) layered on top:
the pass runs on one core while the other 31 idle. The cure is a tiny
round-robin repartition — orders of magnitude below the compute it
parallelizes — but it must be CONDITIONAL: at real scale the scan
already has >= defaultParallelism splits, and an unconditional
round-robin reshuffle of (id, full document text) would be the single
most expensive byte movement in the whole plan for zero semantic
effect.

`ensure_compute_splits` is that conditional guard, factored out of
dedup._spread (round-10 VERDICT ask #3) so the sync/rebuild paths of
the index families and the ANN query sides share ONE implementation —
and one regression test — instead of three hand-rolled copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _parse_bytes_conf(v: str) -> int:
    """Spark size-conf string ("134217728b", "128MB", "1g") → bytes."""
    v = v.strip().lower()
    for suf, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if v.endswith(suf):
            return int(float(v[: -len(suf)])) * mult
    return int(v)


def ensure_compute_splits(df: DataFrame) -> DataFrame:
    """Repartition to full parallelism before CPU-heavy per-row expansion —
    but ONLY when the scan under-splits.

    Small corpora arrive as one parquet split; without a spread, tokenize/
    md5/explode run on a single core. At real scale the scan already has
    >= defaultParallelism splits, and a round-robin reshuffle of
    (id, full document text) would be the single most expensive byte
    movement in the whole plan for zero semantic effect — so it must NOT
    be unconditional.

    Probe order: for file-backed frames, estimate the scan's split count
    from the file list + maxPartitionBytes (driver-side metadata the query
    pays for anyway — no RDD conversion job, ~600 ms cheaper on a cold
    session than df.rdd); only non-file frames fall back to the rdd
    partition probe. Tune spark.sql.files.maxPartitionBytes downward if
    finer scan splits are ever needed instead."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        import os as _os

        from zync_spark.pool import local_paths
        try:
            sizes = [_os.path.getsize(f) for f in local_paths(files)]
        except OSError:
            sizes = []
        total = sum(sizes)
        if total:
            # Spark's own split math (FilePartition.maxSplitBytes):
            # maxSplit = min(maxPartitionBytes,
            #                max(openCostInBytes, bytesPerCore)) with
            # bytesPerCore = (totalBytes + files*openCost)/parallelism,
            # then per-file ceil(size/maxSplit). The earlier coarse
            # estimate max(len(files), total/mpb) UNDERcounted splits, so
            # an already-parallel scan could still get the round-robin
            # full-corpus reshuffle this guard exists to avoid.
            mpb = _parse_bytes_conf(
                spark.conf.get("spark.sql.files.maxPartitionBytes",
                               "134217728b"))
            open_cost = _parse_bytes_conf(
                spark.conf.get("spark.sql.files.openCostInBytes",
                               "4194304b"))
            bytes_per_core = (total + len(files) * open_cost) // max(target, 1)
            max_split = max(1, min(mpb, max(open_cost, bytes_per_core)))
            # Spark BIN-PACKS splits into FilePartitions (each file costs
            # openCost on top of its bytes, partitions close at maxSplit),
            # so the raw split count (per-file ceil) OVERcounts partitions
            # for many-small-file layouts — thousands of tiny files pack
            # into few partitions. The packing bound
            # ceil((total + files*openCost)/maxSplit) never exceeds the
            # actual partition count, so deciding on it can at worst add a
            # redundant repartition, never skip a needed one.
            est = (total + len(files) * open_cost + max_split - 1) // max_split
            # splits cannot exceed ROW GROUPS: a single-row-group file
            # feeds exactly one task no matter how many byte-range
            # splits the math plans over it (pool.total_row_groups —
            # the gsf100 one-hot-task finding, SCALING §14)
            from zync_spark.pool import total_row_groups

            rgs = total_row_groups(files)
            if rgs is not None:
                est = min(est, rgs)
            return df if est >= target else df.repartition(target)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
