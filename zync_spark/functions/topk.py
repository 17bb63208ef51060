"""Grouped top-k for FEW HEAVY GROUPS: sample-threshold pre-filter.

The idiomatic per-group top-k (`row_number()` window + `rank <= k`
filter) is the right plan when groups are numerous — the window shuffle
spreads across group keys and Spark's WindowGroupLimit caps what each
reducer buffers. It degrades exactly when groups are FEW and HEAVY
(`q_group_topk`: 5 order priorities × hundreds of thousands of rows
each): WindowGroupLimit still full-sorts every map partition by
(group, value, tiebreaks) before it can take the per-group head, and a
leading low-cardinality string column defeats the radix/prefix sorter —
every comparison falls back to the slow row comparator. Measured at
gsf1 (1.5M orders, 32 cores): the map-side sort alone is 1.6s of the
1.8s query; DuckDB's heap-based approach takes 0.27s.

`grouped_topk` removes the full sort with an UNCONDITIONALLY EXACT
sample-threshold pre-filter:

1. Deterministic hash-sample (`xxhash64 % rate == 0`) the input and
   take each group's k-th best sampled value. A sample is a sub-multiset
   of its group, so the sample's k-th best is ALWAYS at-or-beyond the
   group's true k-th best — filtering at that threshold can never drop a
   true top-k row. Groups with fewer than k sampled rows yield no
   threshold and are kept whole. No fallback pass, no approximation in
   the result.
2. Join the per-group thresholds back (one row per group — broadcast by
   default) and keep only rows at-or-beyond the threshold: ~rate × k
   expected survivors per group.
3. Exact `row_number()` window over the survivors.

Cost at scale: two scans (threshold pass reads only the projected
columns) + a shuffle of n/rate sampled rows + a shuffle of ~rate·k·G
survivors. No O(n log n) comparator sort anywhere, so the plan survives
a 100× scale-up where the windowed sort would not. Rows whose value is
NULL are always kept through the pre-filter (they can rank inside
top-k only when a group has fewer than k non-null values; the exact
window settles it) — a mostly-NULL value column therefore defeats the
pre-filter, in which case use the plain window.

The reference exposes only global head/tail (`fifo/lake.go:85`,
`README.md:360-366` suggests head-per-group tricks); per-group top-k is
a beyond-reference operator (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_THR = "__gtk_thr"
_RNK = "__gtk_rnk"


def grouped_topk(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreakers: list[str] | None = None,
    sample_rate: int = 64,
    broadcast_thresholds: bool = True,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per group by `value_col`, cheap for few heavy
    groups (see module docstring for the plan shape and why).

    Returns `df`'s columns (plus `rank_col` as a 1-based long when
    requested); ordering ties on `value_col` are broken by
    `tiebreakers` in ascending order — pass enough of them to make the
    order total, or the choice among tied rows is nondeterministic
    (same caveat as the plain window).

    `sample_rate` R trades the two passes off: the threshold pass
    shuffles ~n/R sampled rows, the exact pass windows ~R·k rows per
    group. Correctness never depends on it.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    ties = list(tiebreakers or [])
    value_order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    order = [value_order, *[F.col(t) for t in ties]]

    # 1. threshold pass: k-th best sampled value per group. The hash
    # feeds on the first tiebreaker when given (unique-ish → unbiased
    # sample) else the value column; ANY deterministic subset is safe.
    sample_on = ties[0] if ties else value_col
    samp = df.select(*groups, value_col).filter(
        F.col(value_col).isNotNull()
        & (F.pmod(F.xxhash64(F.col(sample_on)), F.lit(sample_rate)) == 0)
    )
    w_thr = Window.partitionBy(*groups).orderBy(value_order)
    thr = (
        samp.withColumn(_RNK, F.row_number().over(w_thr))
        .filter(F.col(_RNK) == k)
        .select(*groups, F.col(value_col).alias(_THR))
    )
    if broadcast_thresholds:
        thr = F.broadcast(thr)

    # 2. pre-filter: never drops a true top-k row (threshold is a lower
    # bound on the group's k-th best; thresholdless groups kept whole).
    beyond = (
        F.col(value_col) >= F.col(_THR)
        if descending
        else F.col(value_col) <= F.col(_THR)
    )
    survivors = (
        df.join(thr, on=groups, how="left")
        .filter(F.col(_THR).isNull() | F.col(value_col).isNull() | beyond)
        .drop(_THR)
    )

    # 3. exact rank over the survivors.
    w = Window.partitionBy(*groups).orderBy(*order)
    out = survivors.withColumn(_RNK, F.row_number().over(w)).filter(F.col(_RNK) <= k)
    if rank_col is not None:
        return out.withColumn(rank_col, F.col(_RNK).cast("long")).drop(_RNK)
    return out.drop(_RNK)


def grouped_topk_window(
    df: DataFrame,
    group_cols: list[str] | str,
    order: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """The plain-window formulation (row_number + filter) — the right
    plan when groups are numerous, and the differential-test reference
    for `grouped_topk`."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*groups).orderBy(*order)
    out = df.withColumn(_RNK, F.row_number().over(w)).filter(F.col(_RNK) <= k)
    if rank_col is not None:
        return out.withColumn(rank_col, F.col(_RNK).cast("long")).drop(_RNK)
    return out.drop(_RNK)


def approx_topk(
    df: DataFrame,
    key_col: str,
    capacity: int = 256,
) -> DataFrame:
    """Misra–Gries heavy hitters: a MERGEABLE frequency sketch with at
    most `capacity` counters per partition. The 100 TB answer to "top
    tokens / domains / IDs" when exact groupBy-count would shuffle one
    row per distinct key (web-scale vocabularies: billions of keys, most
    singletons): the sketch shuffles at most `capacity` rows per map
    partition, independent of key cardinality.

    Contract (Misra–Gries 1982; merge per Agarwal et al., "Mergeable
    Summaries", PODS'12): every estimate UNDERCOUNTS, by at most
    N/(capacity+1) total stream length N:

        true - N/(capacity+1)  <=  est  <=  true

    so any key with true count > N/(capacity+1) is guaranteed present.
    Absent keys read as est=0, which the same bound covers.

    Shape: one Arrow-batched mapInPandas pass builds a per-partition
    summary (batched MG: merge a batch's value_counts, then subtract the
    (capacity+1)-th largest and drop non-positives — each subtraction
    event is charged to capacity+1 arrivals, preserving the bound), then
    one groupBy-sum over <= capacity × n_partitions summary rows merges
    them (summing MG summaries keeps both inequalities). Python touches
    only the sketch, never more than `capacity` live counters; the merge
    input is sketch-sized, not data-sized.

    Output: (key string, est long) — the merged underestimates, one row
    per surviving key.
    """
    import pandas as pd

    cap = int(capacity)
    if cap < 1:
        raise ValueError("capacity must be >= 1")

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            # dropna=False: a null key is a key like any other — an
            # exact Spark groupBy counts it, so the sketch must too or
            # the "absent keys read est=0 under the bound" contract
            # breaks for a frequent null (round-6 review).
            vc = pdf["key"].value_counts(dropna=False)
            for k_, c in vc.items():
                k_ = None if pd.isna(k_) else k_
                counters[k_] = counters.get(k_, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                sub = vals[cap]  # (capacity+1)-th largest
                counters = {k_: v - sub for k_, v in counters.items()
                            if v > sub}
        yield pd.DataFrame(
            {"key": list(counters.keys()),
             "est": list(counters.values())}
        )

    partials = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .mapInPandas(_mg, "key string, est long")
    )
    return partials.groupBy("key").agg(F.sum("est").alias("est"))


def grouped_approx_topk(
    df: DataFrame,
    group_col: str,
    key_col: str,
    capacity: int = 256,
) -> DataFrame:
    """Per-group Misra-Gries heavy hitters — "top domains per language",
    "top tokens per source" — with `approx_topk`'s contract holding
    WITHIN each group g over its own stream length N_g:

        true_g(key) - N_g/(capacity+1)  <=  est  <=  true_g(key)

    (each partition's per-group summary undercounts that group by at
    most n_{g,p}/(capacity+1); both inequalities survive the summing
    merge, per the same Mergeable Summaries argument). Spark has no
    native grouped frequent-items; the exact alternative shuffles one
    row per distinct (group, key) — web-scale vocabularies again.

    Shape: one Arrow-batched mapInPandas pass holds an independent
    MG summary per group seen in the partition (<= capacity counters
    each; group cardinality is assumed summary-scale — languages,
    sources, shards — the same assumption any per-group sketch makes),
    then one groupBy-sum over summary rows merges across partitions.

    Output: (group_col string, key_col string, est long) — both input
    column names restored.
    """
    import pandas as pd

    cap = int(capacity)
    if cap < 1:
        raise ValueError("capacity must be >= 1")
    if group_col == key_col:
        raise ValueError("group_col and key_col must differ")

    def _mg(batches):
        groups: dict = {}
        for pdf in batches:
            # dropna=False for the same null-key contract reason as
            # approx_topk: exact groupBy counts null groups/keys.
            vc = pdf.groupby(["grp", "key"], dropna=False).size()
            for (g, k_), c in vc.items():
                g = None if pd.isna(g) else g
                k_ = None if pd.isna(k_) else k_
                counters = groups.setdefault(g, {})
                counters[k_] = counters.get(k_, 0) + int(c)
            for g, counters in groups.items():
                if len(counters) > cap:
                    vals = sorted(counters.values(), reverse=True)
                    sub = vals[cap]
                    groups[g] = {k_: v - sub for k_, v in counters.items()
                                 if v > sub}
        yield pd.DataFrame(
            [(g, k_, v) for g, counters in groups.items()
             for k_, v in counters.items()],
            columns=["grp", "key", "est"],
        )

    partials = (
        df.select(F.col(group_col).cast("string").alias("grp"),
                  F.col(key_col).cast("string").alias("key"))
        .mapInPandas(_mg, "grp string, key string, est long")
    )
    return (partials.groupBy("grp", "key").agg(F.sum("est").alias("est"))
            .select(F.col("grp").alias(group_col),
                    F.col("key").alias(key_col), "est"))
