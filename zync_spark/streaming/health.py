"""Index health policy — decide WHEN to rebuild (round 6).

The rebuild verbs exist (`rebuild_ann` / `rebuild_text` / `rebuild_spans`
/ `rebuild_index`, round 5) but nothing triggered them: a drifting
corpus silently degrades IVF recall, and a span/text index sized for
small deltas saturates its prefix buckets until every "bounded" probe
reads most of the pool. `check_*_health(dest, spec)` measures each
family's failure mode against an explicit threshold and returns

    {"healthy": bool, ...measured metrics..., "recommendation": str|None}

so a maintenance loop can gate `rebuild_*` on it (CLI: `*-index
health`; FromKafka(health_every=, auto_rebuild=) runs the check on a
micro-batch cadence and can apply the recommendation itself). When the
cure is expressible as rebuild arguments, `rebuild_args` carries them
structured (e.g. {"prefix_len": 3}) — None means the recommendation
needs a human (source re-ingest).

Per-family policy (what is measured, and why that metric):

- ANN (`check_ann_health`): retrieval QUALITY — avg recall@k of
  `ann_query` vs exact cosine top-k over a deterministic sample of the
  STORED vectors (the same measurement `ann_recall` pins in the
  catalog's bounded-error entry). A quantizer frozen on an
  unrepresentative backfill, or a corpus that drifted away from it,
  scores low; `rebuild_ann` retrains on everything stored. Cell balance
  (max cell size / mean) is reported as an advisory — imbalance is a
  COST symptom, recall is the correctness one.
- span (`check_span_health`): probe-bucket SATURATION — a sync pass
  probes ~1-(1-1/B)^H of the 'w:'/'d:' spaces for a delta of H window
  hashes (module note in span_index.py), so the policy estimates H from
  the stored per-pass win-row counts and flags when the projected
  coverage exceeds `max_coverage`. `rebuild_spans(prefix_len=...)`
  re-buckets; the recommended prefix_len re-applies the sizing rule
  B >= headroom x H.
- text (`check_text_health`): posting-bucket READ AMPLIFICATION — a
  one-term search reads its whole 't:' bucket, i.e. ~distinct_terms/B
  terms' postings; the policy flags when terms-per-bucket exceeds
  `max_terms_per_bucket`. `rebuild_text(prefix_len=...)` re-buckets.
- dedup (`check_dedup_health`): band-collision rate — the fraction of
  stored band rows that share their band key with another document
  (collisions are exactly the candidate-pair generator, so the rate IS
  the per-doc verification cost multiplier) plus the same
  bucket-saturation projection as span for the probe. High collision
  with low Jaccard-confirm yield means the banding is too coarse for
  the corpus; that needs a source re-ingest (k/num_hashes/bands are
  burned into signatures), which the recommendation says honestly.

All checks read ONLY the index pool (never source text) and aggregate
narrow columns; they are maintenance passes, priced like a compaction
decision, not like a query. Reference parity: the reference has no
index surface at all (beyond-reference module).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from zync_spark.pool import Pool


class EmptyIndexError(ValueError):
    """An index pool has nothing to measure (no rows, or every row
    tombstoned) AND nothing a rebuild could retrain on. Subclass of
    ValueError for callers that treated both alike before round 7;
    maintenance loops catch THIS and skip, while a spec-drift
    ValueError (from _check_meta — a real misconfiguration) propagates
    loudly instead of being mistaken for an empty index (round-6
    ADVICE)."""


def _sync_pass_avg(df, row_filter, partition_col="kafka.partition"):
    """Average rows per SYNC pass (partition >= 0 — migrations/rebuilds
    use the reserved -1/-2 labels and say nothing about delta size)."""
    per = (df.filter(row_filter & (F.expr(partition_col) >= 0))
           .groupBy(F.expr(partition_col).alias("__p"))
           .agg(F.count("*").alias("__n"))
           .agg(F.avg("__n").alias("a")).collect()[0]["a"])
    return float(per) if per is not None else None


def _coverage(buckets: int, hashes: float) -> float:
    """Expected fraction of B buckets touched by H uniform hashes."""
    if hashes is None or buckets <= 0:
        return 0.0
    return 1.0 - (1.0 - 1.0 / buckets) ** hashes


def _plen_for(target_buckets: float) -> int:
    """Smallest prefix_len whose 16^p fan-out meets the target."""
    return max(1, min(8, math.ceil(math.log(max(target_buckets, 16), 16))))


_CELL_CAP = 65536  # ann_index._cell_ckey's 4-hex-char label width


def _occupancy_policy(n_vecs: int, mean_occ: float, max_occ: int,
                      max_mean_occupancy: float, max_balance: float,
                      spec_iterations: int) -> dict:
    """Shared occupancy/skew verdict for the two vector families
    (round 10 — SCALING §18.5's residual made policy).

    Two distinct failure shapes, two gates:
    - MEAN occupancy past `max_mean_occupancy`: cells fattened uniformly
      under a frozen n_cells — per-pass probe cost grows linearly with
      the corpus. Cure: resize to ~sqrt(N) cells (floored so
      post-rebuild mean lands at or below HALF the threshold —
      hysteresis).
    - BALANCE (max/mean) past `max_balance` while max is itself above
      the threshold: the quantizer is SKEWED — a catch-all cell absorbs
      a constant fraction of every delta, so per-pass cost grows
      linearly NO MATTER how many cells exist (the §18.5 B2 residual:
      resize landed mean at 446 while one cell held 7,951→10,122). A
      mean-only policy is blind to this; it fired an O(corpus) rebuild
      that bought nothing.

    Either way the cure is one rebuild, but its ARGUMENTS differ from
    the round-9 recipe in two measured ways: `init="sample"` (Forgy
    spread seeding — the modulo init's centroids are k near-copies of
    the global mean, the root cause of the collapse) and `iterations`
    scaled with k (2 Lloyd rounds cannot separate hundreds of
    centroids; ceil(log2(k)) rounds give each split a doubling).

    Returns the verdict fields + rebuild args; `capped` flags when
    rec_cells hit the 65536 cell-label cap AND the capped rebuild still
    cannot bring mean occupancy under the threshold (round-9 ADVICE:
    say so instead of steering operators into a no-op rebuild loop)."""
    balance = (float(max_occ) / mean_occ) if mean_occ else 1.0
    mean_ok = mean_occ <= max_mean_occupancy
    skew_ok = (max_occ <= max_mean_occupancy) or (balance <= max_balance)
    rec_cells = min(_CELL_CAP,
                    max(math.ceil(math.sqrt(max(n_vecs, 1))),
                        math.ceil(n_vecs / max(max_mean_occupancy / 2, 1))))
    rec_iters = max(int(spec_iterations),
                    math.ceil(math.log2(max(rec_cells, 2))))
    capped = (rec_cells == _CELL_CAP
              and n_vecs / _CELL_CAP > max_mean_occupancy)
    return {
        "mean_ok": mean_ok, "skew_ok": skew_ok,
        "balance": round(balance, 2),
        "rec_cells": rec_cells, "rec_iters": rec_iters,
        "capped": capped,
        "args": {"n_cells": rec_cells, "iterations": rec_iters,
                 "init": "sample"},
    }


def check_ann_health(dest: Pool, spec, k: int = 10, nprobe: int = 2,
                     sample: int = 32,
                     min_recall: float = 0.5,
                     max_mean_occupancy: float = 2048.0,
                     max_balance: float = 8.0) -> dict:
    """Recall@k of the stored index on a deterministic sample of its own
    vectors, vs `min_recall` (the sample is the lowest-id stored vectors
    — stable across runs; the exact side is one measurement scan, same
    cost note as ann_recall) — PLUS the occupancy/skew policy shared
    with the embdedup family (round 10: the IVF index has the same
    frozen-n_cells linear-fattening arithmetic — per-query probe cost
    grows with cell occupancy even at fixed nprobe, and recall stays
    perfect while it happens, so cell_balance-as-advisory caught
    nothing). Unhealthy on ANY of: recall below floor, mean occupancy
    past threshold, or a skewed quantizer (max/mean past `max_balance`
    with max itself above threshold). An occupancy/skew cure implies a
    retrain, so its rebuild_args (resize + spread init + scaled
    iterations, _occupancy_policy) also cure a simultaneous recall
    failure."""
    from zync_spark.streaming import ann_index as AI
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    stored = dest.scan()
    if stored is None or "vec_id" not in stored.columns:
        raise EmptyIndexError(f"ann index {spec.name!r} is empty")
    vecs = mask_rows(stored.filter(AI._is_vec(spec)),
                     read_tombs(dest, spec.topic), "vec_id")
    n_vecs = vecs.count()
    if n_vecs == 0:
        # all vectors tombstoned: nothing to measure AND nothing a
        # rebuild could retrain on — raising (like the empty-pool case)
        # keeps auto_rebuild from attempting a retrain that must fail
        # (round-6 review)
        raise EmptyIndexError(
            f"ann index {spec.name!r} has no live vectors to measure")
    qs = (vecs.orderBy("vec_id").limit(int(sample))
          .select("vec_id", F.col("v").alias("emb")))
    rec = (AI.ann_recall(dest, spec, qs, id_col="vec_id", vec_col="emb",
                         k=k, nprobe=nprobe)
           .agg(F.avg("recall").alias("a")).collect()[0]["a"])
    cells = (vecs.groupBy("cell").agg(F.count("*").alias("n"))
             .agg(F.max("n").alias("mx"), F.avg("n").alias("av"),
                  F.count("*").alias("nc")).collect()[0])
    mean_occ = float(cells["av"] or 0.0)
    max_occ = int(cells["mx"] or 0)
    pol = _occupancy_policy(n_vecs, mean_occ, max_occ,
                            max_mean_occupancy, max_balance,
                            spec.iterations)
    recall_ok = rec is not None and float(rec) >= min_recall
    healthy = recall_ok and pol["mean_ok"] and pol["skew_ok"]
    if not pol["mean_ok"] or not pol["skew_ok"]:
        why = (f"mean occupancy {mean_occ:.0f} vectors/cell exceeds "
               f"{max_mean_occupancy:g}" if not pol["mean_ok"] else
               f"cell balance {pol['balance']:.1f} (max {max_occ} / mean "
               f"{mean_occ:.0f}) exceeds {max_balance:g} — a catch-all "
               "cell absorbs a constant fraction of every query's probe")
        rec_txt = (
            f"rebuild_ann(dest, spec, n_cells={pol['rec_cells']}, "
            f"iterations={pol['rec_iters']}, init='sample') — {why}; "
            "spread seeding + scaled Lloyd rounds retrain a separated "
            f"quantizer over all {n_vecs} stored vectors")
        if pol["capped"]:
            rec_txt += (
                f" [NOTE: n_cells is CAPPED at {_CELL_CAP} (cell-label "
                f"width) and {n_vecs} vectors / {_CELL_CAP} cells still "
                f"exceeds the {max_mean_occupancy:g} threshold — the "
                "rebuild improves balance but cannot clear the mean "
                "gate; raise max_mean_occupancy or shard the index]")
        args = pol["args"]
    elif not recall_ok:
        rec_txt = (
            f"rebuild_ann(dest, spec) — retrain the frozen quantizer on "
            f"all {n_vecs} stored vectors (recall {float(rec or 0):.3f} < "
            f"{min_recall}); consider a larger n_cells if the corpus "
            "has grown")
        args = {}
    else:
        rec_txt, args = None, None
    return {
        "family": "ann", "healthy": bool(healthy),
        "avg_recall": round(float(rec or 0.0), 4),
        "min_recall": min_recall, "k": k, "nprobe": nprobe,
        "sample": int(sample), "n_vectors": int(n_vecs),
        "cells_used": int(cells["nc"] or 0),
        "cell_balance": pol["balance"],
        "max_cell_occupancy": max_occ,
        "mean_cell_occupancy": round(mean_occ, 1),
        "max_mean_occupancy": max_mean_occupancy,
        "max_balance": max_balance,
        "mean_ok": pol["mean_ok"], "skew_ok": pol["skew_ok"],
        "recommendation": rec_txt,
        "rebuild_args": args,
    }


def check_embdedup_health(dest: Pool, spec, sample: int = 32,
                          min_pair_recall: float = 0.5,
                          max_mean_occupancy: float = 2048.0,
                          max_balance: float = 8.0) -> dict:
    """Blocking QUALITY and cell OCCUPANCY of the embdedup index.

    Quality (round 8): the family's failure mode is frozen blocks
    drifting away from the corpus — true near-dups land in DIFFERENT
    cells and the within-cell pair emission never sees them. Measured
    directly: for a deterministic sample of stored vectors (lowest ids —
    stable across runs), find each one's exact best neighbor over the
    live corpus; among those whose best neighbor clears the spec's
    threshold (a true near-dup pair), the PAIR RECALL is the fraction
    co-located in one cell — exactly the fraction the index can
    discover. `rebuild_embdedup` retrains the blocks on everything
    stored. One measurement scan (sample x corpus broadcast join), the
    same cost note as check_ann_health's exact side — size `sample` and
    the check CADENCE for the corpus; this is a maintenance pass, not
    something to cron per-minute on a 100-TB pool. A sample with no
    qualifying near-dup pairs is healthy by definition (nothing to
    recall) and says so in the verdict.

    Occupancy (round 9): n_cells is FROZEN at creation, so cells fatten
    linearly with the corpus — per-pass sync cost is O(delta x its
    cells' stored vectors), a constant that grows even while pair
    recall stays perfect (the round-8 VERDICT's one 100-TB soft spot).
    Measured as mean live vectors per USED cell (one bounded groupBy
    over the 'l:' space); past `max_mean_occupancy` the cure is
    `rebuild_embdedup(n_cells=~sqrt(N))` — the SemDeDup/IVF balance
    point where per-pass probe work and cell count grow together as
    sqrt(corpus) instead of one of them linearly. The recommended
    n_cells is max(ceil(sqrt(N)), ceil(N / (max/2))): the sqrt target,
    floored so post-rebuild occupancy lands at or below HALF the
    threshold (hysteresis — the next breach needs real growth, not
    noise).

    Skew (round 10 — _occupancy_policy): mean at target with max 20x
    above it means the QUANTIZER collapsed, not that cells are too few
    (SCALING §18.5's B2 run: resize landed mean 446 while one catch-all
    cell held 7,951→10,122 and post-resize passes were no faster). The
    `max_balance` gate fires on max/mean with max above the threshold,
    and every occupancy-motivated rebuild now carries init='sample' +
    iterations scaled with k — the quantizer-geometry cure, not just
    more cells."""
    from zync_spark.functions import similarity as S
    from zync_spark.streaming import ann_index as AI
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    stored = dest.scan()
    if stored is None or "vec_id" not in stored.columns:
        raise EmptyIndexError(f"embdedup index {spec.name!r} is empty")
    vecs = mask_rows(stored.filter(AI._is_vec(spec)),
                     read_tombs(dest, spec.topic), "vec_id")
    n_vecs = vecs.count()
    if n_vecs == 0:
        raise EmptyIndexError(
            f"embdedup index {spec.name!r} has no live vectors to measure")
    corpus = vecs.select("vec_id", F.col("v").alias("emb"))
    qs = (vecs.orderBy("vec_id").limit(int(sample))
          .select("vec_id", F.col("v").alias("emb")))
    cents = AI.stored_centroids(dest, spec)
    best = S.cosine_topk(corpus, qs, "vec_id", "emb", k=1,
                         dim=len(cents[0][1]) if cents else None)
    cells = vecs.select("vec_id", "cell")
    judged = (best.filter(F.col("cos") >= spec.threshold)
              .join(cells.select(F.col("vec_id").alias("query_id"),
                                 F.col("cell").alias("__cq")), "query_id")
              .join(cells.select(F.col("vec_id").alias("neighbor_id"),
                                 F.col("cell").alias("__cn")),
                    "neighbor_id")
              .agg(F.count("*").alias("n"),
                   F.sum(F.when(F.col("__cq") == F.col("__cn"), 1)
                         .otherwise(0)).alias("hit"))
              .collect()[0])
    n_qual = int(judged["n"] or 0)
    recall = (float(judged["hit"]) / n_qual) if n_qual else None
    occ = (vecs.groupBy("cell").agg(F.count("*").alias("n"))
           .agg(F.max("n").alias("mx"), F.avg("n").alias("av"),
                F.count("*").alias("nc")).collect()[0])
    mean_occ = float(occ["av"] or 0.0)
    max_occ = int(occ["mx"] or 0)
    pol = _occupancy_policy(n_vecs, mean_occ, max_occ,
                            max_mean_occupancy, max_balance,
                            spec.iterations)
    recall_ok = recall is None or recall >= min_pair_recall
    healthy = recall_ok and pol["mean_ok"] and pol["skew_ok"]
    if not pol["mean_ok"] or not pol["skew_ok"]:
        why = (f"mean occupancy {mean_occ:.0f} vectors/cell exceeds "
               f"{max_mean_occupancy:g} ({n_vecs} vectors across "
               f"{int(occ['nc'] or 0)} frozen cells): per-pass sync "
               "cost grows with the corpus"
               if not pol["mean_ok"] else
               f"cell balance {pol['balance']:.1f} (max {max_occ} / "
               f"mean {mean_occ:.0f}) exceeds {max_balance:g}: a "
               "catch-all cell absorbs a constant fraction of every "
               "delta's scoring")
        rec = (f"rebuild_embdedup(dest, spec, n_cells={pol['rec_cells']}, "
               f"iterations={pol['rec_iters']}, init='sample') — {why}; "
               "spread seeding + scaled Lloyd rounds retrain a separated "
               f"quantizer (~{n_vecs // pol['rec_cells']}/cell at target)")
        if pol["capped"]:
            rec += (
                f" [NOTE: n_cells is CAPPED at {_CELL_CAP} (cell-label "
                f"width) and {n_vecs} vectors / {_CELL_CAP} cells still "
                f"exceeds the {max_mean_occupancy:g} threshold — the "
                "rebuild improves balance but cannot clear the mean "
                "gate; raise max_mean_occupancy or shard the index]")
        args = pol["args"]
    elif not recall_ok:
        rec = (f"rebuild_embdedup(dest, spec) — retrain the frozen "
               f"blocks on all {n_vecs} stored vectors (pair recall "
               f"{recall:.3f} < {min_pair_recall}: near-dups are "
               "straddling cell boundaries); consider a larger n_cells "
               "if the corpus has grown")
        args = {}
    else:
        rec, args = None, None
    return {
        "family": "embdedup", "healthy": bool(healthy),
        "pair_recall": None if recall is None else round(recall, 4),
        "min_pair_recall": min_pair_recall,
        "sample": int(sample), "qualifying_pairs": n_qual,
        "n_vectors": int(n_vecs),
        "cells_used": int(occ["nc"] or 0),
        "max_cell_occupancy": max_occ,
        "mean_cell_occupancy": round(mean_occ, 1),
        "max_mean_occupancy": max_mean_occupancy,
        "cell_balance": pol["balance"],
        "max_balance": max_balance,
        "mean_ok": pol["mean_ok"], "skew_ok": pol["skew_ok"],
        "recommendation": rec,
        "rebuild_args": args,
    }


def check_span_health(dest: Pool, spec,
                      max_coverage: float = 0.5,
                      headroom: float = 10.0) -> dict:
    """Projected probe coverage 1-(1-1/B)^H for the TYPICAL delta (H =
    avg win rows per stored sync pass) vs `max_coverage`. The
    recommendation re-applies the module's sizing rule: pick prefix_len
    so B >= headroom x H."""
    from zync_spark.streaming.span_index import _check_meta, _is

    _check_meta(dest, spec)
    df = dest.scan()
    if df is None or "h" not in df.columns:
        raise EmptyIndexError(f"span index {spec.name!r} is empty")
    avg_h = _sync_pass_avg(df, _is(spec, "win"))
    buckets = 16 ** spec.prefix_len
    cov = _coverage(buckets, avg_h)
    healthy = cov <= max_coverage
    rec_plen = _plen_for(headroom * (avg_h or 1.0))
    return {
        "family": "span", "healthy": bool(healthy),
        "buckets": buckets, "prefix_len": spec.prefix_len,
        "avg_delta_hashes": round(avg_h or 0.0, 1),
        "projected_probe_coverage": round(cov, 4),
        "max_coverage": max_coverage,
        "recommendation": None if healthy else (
            f"rebuild_spans(dest, spec, prefix_len={rec_plen}) — "
            f"{buckets} buckets saturate at ~{cov:.0%} per typical "
            f"delta (~{avg_h:.0f} hashes); {16 ** rec_plen} buckets "
            f"project to ~{_coverage(16 ** rec_plen, avg_h):.0%}"),
        "rebuild_args": None if healthy else {"prefix_len": rec_plen},
    }


def check_text_health(dest: Pool, spec,
                      max_terms_per_bucket: float = 4096.0) -> dict:
    """Read amplification of a one-term search: ~distinct_terms/B terms'
    postings come back per probed bucket. Flags when terms-per-bucket
    exceeds the threshold; rebuild_text re-buckets in place."""
    from zync_spark.streaming.text_index import _check_meta, _is

    _check_meta(dest, spec)
    df = dest.scan()
    if df is None or "term" not in df.columns:
        raise EmptyIndexError(f"text index {spec.name!r} is empty")
    n_terms = (df.filter(_is(spec, "post"))
               .agg(F.count_distinct("term").alias("t"))
               .collect()[0]["t"]) or 0
    buckets = 16 ** spec.prefix_len
    tpb = n_terms / buckets
    healthy = tpb <= max_terms_per_bucket
    rec_plen = _plen_for(n_terms / max(max_terms_per_bucket, 1.0))
    return {
        "family": "text", "healthy": bool(healthy),
        "buckets": buckets, "prefix_len": spec.prefix_len,
        "distinct_terms": int(n_terms),
        "terms_per_bucket": round(tpb, 1),
        "max_terms_per_bucket": max_terms_per_bucket,
        "recommendation": None if healthy else (
            f"rebuild_text(dest, spec, prefix_len={rec_plen}) — "
            f"{tpb:.0f} terms share each of {buckets} buckets; "
            f"{16 ** rec_plen} buckets bring a one-term read down to "
            f"~{n_terms / 16 ** rec_plen:.0f} terms' postings"),
        "rebuild_args": None if healthy else {"prefix_len": rec_plen},
    }


def check_dedup_health(dest: Pool, spec,
                       max_coverage: float = 0.5,
                       max_collision_rate: float = 0.5,
                       headroom: float = 10.0) -> dict:
    """Band-collision rate (fraction of band rows sharing their band key
    — each collision is a candidate pair the exact-Jaccard verifier must
    pay for) plus the same probe-saturation projection as the span
    family (H = avg band rows per sync pass)."""
    from zync_spark.streaming.dedup_index import _check_meta, _is_band

    _check_meta(dest, spec)
    df = dest.scan()
    if df is None or "bkey" not in df.columns:
        raise EmptyIndexError(f"dedup index {spec.name!r} has no band rows")
    bands = df.filter(_is_band(spec))
    agg = bands.agg(F.count("*").alias("n"),
                    F.count_distinct("bkey").alias("d")).collect()[0]
    n, d = int(agg["n"] or 0), int(agg["d"] or 0)
    collision = (1.0 - d / n) if n else 0.0
    avg_h = _sync_pass_avg(df, _is_band(spec))
    buckets = 16 ** spec.prefix_len
    cov = _coverage(buckets, avg_h)
    sat_ok = cov <= max_coverage
    col_ok = collision <= max_collision_rate
    rec_plen = _plen_for(headroom * (avg_h or 1.0))
    rec = None
    if not sat_ok:
        rec = (f"rebuild_index(dest, spec, prefix_len={rec_plen}) — "
               f"{buckets} buckets saturate at ~{cov:.0%} per typical "
               f"delta (~{avg_h:.0f} band rows)")
    elif not col_ok:
        rec = (f"band-collision rate {collision:.0%} exceeds "
               f"{max_collision_rate:.0%}: either the corpus is heavily "
               "duplicated (expected — confirm via pairs_view yield) or "
               "the banding is too coarse; k/num_hashes/bands are burned "
               "into stored signatures, so changing them means "
               "re-ingesting the source into a fresh index")
    return {
        "family": "dedup", "healthy": bool(sat_ok and col_ok),
        "buckets": buckets, "prefix_len": spec.prefix_len,
        "band_rows": n, "distinct_band_keys": d,
        "collision_rate": round(collision, 4),
        "max_collision_rate": max_collision_rate,
        "avg_delta_band_rows": round(avg_h or 0.0, 1),
        "projected_probe_coverage": round(cov, 4),
        "max_coverage": max_coverage,
        "recommendation": rec,
        # only the saturation cure is auto-applicable; the collision
        # advisory needs a source re-ingest (banding is burned in)
        "rebuild_args": {"prefix_len": rec_plen} if not sat_ok else None,
    }

def check_pool_health(dest: Pool,
                      max_masked_fraction: float = 0.2,
                      max_tombstones: int = 100_000,
                      vacuum_after_s: float | None = None) -> dict:
    """Retention policy for a TOMBSTONED index pool (round 7): decide
    WHEN to fold, the way check_*_health decides when to rebuild.

    Tombstones make deletes O(1), but they only leave physically when a
    compaction happens to run — a delete-heavy pool with no organic
    small-files pressure pays the mask join on every read and carries
    dead rows forever. This check measures exactly what a fold-compaction
    would reclaim:

    - `masked_fraction`: 1 - live/total where live counts the rows that
      survive `fold_tombstones` — the SAME transform `fold_compact`
      applies, so the policy metric and the cure can never drift. Covers
      sequence-masked rows, the tombstone rows themselves, span
      retraction markers, and the hit/dup rows they retract.
    - `live_tombstones`: size of the 'x:' space (every masking read
      broadcasts this; it is the per-read overhead deletes cost).
    - `unreferenced_files` (only when `vacuum_after_s` is given): data
      files a past compaction superseded that are older than the window
      — what `Pool.vacuum(retention_s=vacuum_after_s)` would delete.

    Unhealthy when masked_fraction or live_tombstones exceed their
    thresholds; `compact_args` carries the structured cure for a
    maintenance loop (`fold_compact(dest, specs=...)` — family-agnostic,
    one pass folds every co-tenant family). Cost: two narrow-column
    counts over the pool — priced like the compaction decision it is.

    Family-agnostic on purpose: multi-tenant pools (text + span over one
    corpus) fold in ONE compaction, so their retention policy must also
    be one check per POOL, not one per spec."""
    from zync_spark.streaming.tombstones import (TOMB_BOUNDS,
                                                 fold_tombstones)

    df = dest.scan()
    if df is None:
        raise EmptyIndexError(f"pool {dest.path} is empty")
    total = df.count()
    if total == 0:
        raise EmptyIndexError(f"pool {dest.path} has no rows")
    live = fold_tombstones(df).count()
    masked = total - live
    frac = masked / total
    tombs = 0
    if "upto" in df.columns and "did" in df.columns:
        tdf = dest.scan(bounds={"ckey": TOMB_BOUNDS})
        if tdf is not None:
            tombs = (tdf.filter(F.col("zed_type").eqNullSafe("tomb"))
                     .count())
    unref = None
    if vacuum_after_s is not None:
        # the SAME discovery walk the cure runs (Pool.vacuum dry_run) —
        # census and reclaim cannot drift (round-7 review)
        unref = dest.vacuum(retention_s=vacuum_after_s, dry_run=True)
    frac_ok = frac <= max_masked_fraction
    tomb_ok = tombs <= max_tombstones
    healthy = frac_ok and tomb_ok
    rec = None
    if not healthy:
        why = (f"{masked} of {total} rows ({frac:.0%}) are dead"
               if not frac_ok else
               f"{tombs} live tombstones ride every masking read")
        rec = (f"fold_compact(dest) — {why}; the base rewrite drops "
               "masked rows and the tombstones together"
               + ("" if vacuum_after_s is None else
                  f", then vacuum(retention_s={vacuum_after_s:g}) "
                  f"reclaims superseded files"))
    return {
        "family": "pool", "healthy": bool(healthy),
        "rows": int(total), "live_rows": int(live),
        "masked_rows": int(masked),
        "masked_fraction": round(frac, 4),
        "max_masked_fraction": max_masked_fraction,
        "live_tombstones": int(tombs),
        "max_tombstones": int(max_tombstones),
        "commits_since_base": dest.commits_since_base(),
        "unreferenced_files": unref,
        "recommendation": rec,
        # structured cure, rebuild_args-style: {} means "fold_compact
        # with defaults" (the loop adds its own specs/vacuum knobs)
        "compact_args": None if healthy else {},
    }
