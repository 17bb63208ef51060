"""CLI mirroring the reference's command surface (cmd/zync/*, SURVEY §2.11):

  consume    topic → decoded output (pool-backed stand-in without a broker)
  produce    input files → topic pool
  from-kafka continuous topic→pool sync (needs spark-sql-kafka + broker)
  to-kafka   pool → topic sync from HWM
  etl        one transactional ETL pass from a YAML transform
  ls         registry subjects/schemas
  info       topic watermarks

Pools live under a lake root directory (--lake, default ./lake), one pool
per subdirectory — the Spark-side stand-in for the Zed lake service.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark():
    from zync_spark.session import get_spark

    spark = get_spark("zync-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _pool(spark, lake: str, name: str, create: bool = False):
    from zync_spark.pool import Pool

    path = os.path.join(lake, name)
    if os.path.exists(os.path.join(path, "pool.json")):
        return Pool.open(spark, path)
    if not create:
        raise SystemExit(f"zync-spark: no such pool {name!r} in lake {lake!r}")
    return Pool.create(spark, path)


def cmd_etl(args) -> int:
    from zync_spark.etl import EtlPipeline, load_config

    transform = load_config(args.config)
    if getattr(args, "zed", False):
        # the reference's exact `zync etl -zed` behavior: print the zed
        # program the spec compiles to (no Spark session needed; the text
        # matches ztests/etl-zed.yaml token-for-token and zedpipe can run
        # it — see etl/zedgen.py)
        from zync_spark.etl.zedgen import generate_program

        print(generate_program(transform), end="")
        return 0
    spark = _spark()
    pools = {n: _pool(spark, args.lake, n, create=True) for n in transform.pool_names()}
    pipeline = EtlPipeline(spark, transform, pools)
    if args.plan:
        for pool_name, (outputs, _markers) in pipeline.build_all().items():
            print(f"-- output pool {pool_name} --")
            if outputs is None:
                print("-- empty plan (no unprocessed input) --")
                continue
            print(outputs._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        return 0
    n = pipeline.run(args.message)
    print(f"ETL'd {n} records")
    return 0


def cmd_query(args) -> int:
    """Run a query over the lake: every pool is registered as a view.

    Default dialect is SQL; `--zed` runs a zed pipeline (`from pool | where
    ... | cut ... | sort ...`) through zedpipe — the reference's own query
    language (what its users feed the embedded engine, fifo/lake.go:94-106),
    compiled to the same DataFrame plans."""
    src = args.sql
    use_zed = args.zed
    if getattr(args, "include", None):
        # `query -I FILE` — run a zed program from a file, the reference's
        # `zed query -I demo/update.zed` form (design.md:353-356)
        if src is not None:
            raise SystemExit("zync-spark: give either a program string or -I FILE")
        with open(args.include) as f:
            src = f.read()
        use_zed = True
    if src is None:
        raise SystemExit("zync-spark: query needs a program string or -I FILE")
    spark = _spark()
    pushed: dict[str | None, dict] = {}
    if use_zed:
        # manifest-level file skipping derived from the program's own
        # leading filters (sound: the compiled filter still applies)
        from zync_spark.pushdown import program_bounds

        pushed = program_bounds(src)
    tables = {}
    pool_names = [name for name in sorted(os.listdir(args.lake))
                  # only pool directories (skips checkpoints and foreign files)
                  if os.path.exists(os.path.join(args.lake, name, "pool.json"))]
    for name in pool_names:
        bounds = pushed.get(name)
        if bounds is None and len(pool_names) == 1:
            bounds = pushed.get(None)  # implicit single-input program
        pool = _pool(spark, args.lake, name)
        lb = None
        if bounds:
            from zync_spark.pushdown import lower_bounds_from

            lb = lower_bounds_from(bounds)
        if args.explain and bounds:
            kept = len(pool.committed_files(lb, bounds=bounds))
            total = len(pool.committed_files())
            print(f"-- manifest pruning: pool {name}: {kept}/{total} "
                  f"file(s) after bounds {bounds}"
                  + (f", commit lower_bounds {lb}" if lb else ""))
        df = pool.scan(lower_bounds=lb, bounds=bounds or None)
        if df is None and bounds:
            # bounds pruned every file: the program is still valid and
            # must see an EMPTY frame, not a missing table (limit(0)
            # collapses to an empty LocalRelation — no file reads)
            full = pool.scan()
            df = full.limit(0) if full is not None else None
        if df is not None:
            df.createOrReplaceTempView(name)
            tables[name] = df
    if use_zed:
        from zync_spark.zedpipe import compile_query

        result = compile_query(src, tables)
    else:
        result = spark.sql(src)
    if args.explain:
        print(result._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        return 0
    if getattr(args, "z", False):
        from zync_spark import zson

        schema = result.schema
        for r in result.collect():
            print(zson.render_row(r, schema))
        return 0
    for line in result.toJSON().collect():
        print(line)
    return 0


def cmd_consume(args) -> int:
    """Dump a topic's records from its pool in offset order as JSON lines
    (broker-less analog of cmd/zync/consume)."""
    from pyspark.sql import functions as F

    from zync_spark.pushdown import lower_bounds_from, merge_bounds, where_bounds

    spark = _spark()
    # consume's own predicate (topic equality + offset floor) plus any
    # --where conjuncts prune the scan twice over: whole COMMITS by
    # manifest per-topic offset stats (any pool), then FILES by col_stats
    # (clustered/compacted pools); the row filters below apply in full
    bounds = merge_bounds(
        {"kafka.topic": (args.topic, args.topic),
         "kafka.offset": (args.offset, None)},
        where_bounds(args.where) if args.where else {},
    )
    pool = _pool(spark, args.lake, args.pool)
    df = pool.scan(lower_bounds=lower_bounds_from(bounds),
                   at=args.at, at_ts=args.at_ts, bounds=bounds)
    if df is None and bounds:
        # all pruned: --out must still produce its (empty) output
        full = pool.scan(at=args.at, at_ts=args.at_ts)
        df = full.limit(0) if full is not None else None
    if df is None:
        return 0
    out = (
        df.filter(F.col("kafka.topic") == args.topic)
        .filter(F.col("kafka.offset") >= args.offset)
        .orderBy(F.col("kafka.offset"))
    )
    if args.where:
        from zync_spark import zedexpr

        out = out.filter(zedexpr.compile_expr(args.where, zedexpr.Context()))
    if args.format == "parquet" and not args.out:
        print("consume: --format parquet requires --out PATH")
        return 2
    if args.out:
        # distributed write (the scale path — no driver collect); csv needs
        # a flat schema, so dotted-flatten the envelope first
        from zync_spark.envelope import flatten_dotted

        w = flatten_dotted(out) if args.format == "csv" else out
        w.write.format(args.format).mode("overwrite").save(args.out)
        return 0
    if args.format == "csv":
        from zync_spark.envelope import flatten_dotted

        flat = flatten_dotted(out)
        cols = [f.name for f in flat.schema.fields]
        print(",".join(cols))
        for r in flat.collect():
            print(",".join("" if r[c] is None else str(r[c]) for c in cols))
        return 0
    if args.format == "zson":
        # the reference's own output text (`zed query -z`): per-value
        # shapes + named-type decorators, incl. nested ones from the
        # pool's registry sidecar
        from zync_spark import zson

        names = _pool(spark, args.lake, args.pool).type_names()
        schema = out.schema
        for r in out.collect():
            print(zson.render_row(r, schema, names))
        return 0
    for line in out.toJSON().collect():
        print(line)
    return 0


def cmd_rollup(args) -> int:
    """Maintain an incremental materialized rollup from a YAML spec
    (streaming/incremental.py). Actions:

      sync  one maintenance pass: aggregate the cursor-bounded delta and
            commit partials + advanced cursor atomically (rerun = no-op)
      view  print the rollup's merged current value as JSON lines
      fold  collapse accumulated partials during a compaction pass

    Spec YAML:
      name: events_by_type
      source: src_pool
      dest: summary_pool
      topics: [events]
      keys: {event_type: value.event_type}
      aggs:
        - {col: n, kind: count}
        - {col: total, kind: sum, expr: "CAST(value.value AS DECIMAL(14,2))"}
    """
    from zync_spark.streaming import incremental as inc

    spec, spec_doc = inc.load_rollup_spec(args.spec)
    spark = _spark()
    dest = _pool(spark, args.lake, spec_doc["dest"], create=True)
    if args.action == "sync":
        src = _pool(spark, args.lake, spec_doc["source"])
        n = inc.sync(src, dest, spec, list(spec_doc["topics"]))
        print(f"rollup {spec.name}: {n} partial rows committed")
    elif args.action == "fold":
        n = inc.fold(dest, spec)
        print(f"rollup {spec.name}: folded ({n} rows in base)")
    else:
        v = inc.view(dest, spec)
        if v is not None:
            for line in v.orderBy(*list(spec.keys)).toJSON().collect():
                print(line)
    return 0


def cmd_dedup_index(args) -> int:
    """Maintain an incremental MinHash-LSH dedup index from a YAML spec
    (streaming/dedup_index.py). Actions:

      sync     one maintenance pass: signatures for the cursor-bounded
               delta, BOUNDED banded probe of the stored index (only
               colliding ckey buckets are read once the pool is
               compacted), exact-Jaccard verify; index + band rows +
               pairs + cursor commit atomically (rerun = no-op)
      pairs    print discovered duplicate pairs as JSON lines; --ids
               bounds the read to those canonical smaller members'
               buckets (point lookup, file-skipped)
      index    print the stored index rows (doc_id + band keys)
      compact  range-cluster the index pool by ckey so sync's probes
               skip non-colliding files (run on small-files cadence)
      migrate  upgrade a pre-band-row pool (one commit; see
               streaming/dedup_index.py migrate_band_rows)
      rebuild  re-bucket every key space at a new --prefix-len in
               place, source-free (one OCC base commit; k/num_hashes/
               bands need a source re-ingest — they are burned into
               the stored signatures)
      delete   tombstone --ids out of the LATEST state (one O(1)
               commit; pairs with a dead member disappear; the fold
               happens at the next compact) — the CDC update flow is
               delete, republish, sync
      health   band-collision rate + probe-saturation projection vs
               --max-coverage; JSON verdict with a rebuild
               recommendation when unhealthy

    Spec YAML:
      name: docs
      source: src_pool
      dest: index_pool
      topics: [documents]
      id: value.doc_id
      text: value.text
      k: 3            # optional (shingle size)
      num_hashes: 64  # optional
      bands: 16       # optional
      threshold: 0.5  # optional (Jaccard)
    """
    from zync_spark.streaming import dedup_index as di

    spec, doc = di.load_index_spec(args.spec)
    spark = _spark()
    dest = _pool(spark, args.lake, doc["dest"], create=True)
    if args.action == "sync":
        src = _pool(spark, args.lake, doc["source"])
        stats: dict = {}
        n = di.sync_index(src, dest, spec, list(doc["topics"]),
                          stats_out=stats,
                          auto_compact_every=args.auto_compact)
        probe = (f" (probe read {stats['probe_files']}/"
                 f"{stats['live_files']} files)"
                 if "probe_files" in stats else "")
        print(f"dedup-index {spec.name}: {n} rows committed{probe}")
    elif args.action == "compact":
        n = di.compact_index(dest, spec=spec)
        print(f"dedup-index {spec.name}: compacted {n} rows")
    elif args.action == "migrate":
        n = di.migrate_band_rows(dest, spec)
        print(f"dedup-index {spec.name}: {n} band rows migrated")
    elif args.action == "delete":
        if not args.ids:
            raise SystemExit("dedup-index delete requires --ids ID,ID")
        n = di.tombstone_index(dest, spec,
                               [int(x) for x in args.ids.split(",")])
        print(f"dedup-index {spec.name}: {n} tombstone rows committed")
    elif args.action == "health":
        from zync_spark.streaming.health import check_dedup_health

        print(json.dumps(check_dedup_health(
            dest, spec, max_coverage=args.max_coverage)))
    elif args.action == "rebuild":
        if args.prefix_len is None:
            raise SystemExit("dedup-index rebuild requires --prefix-len "
                             "(the one parameter changeable source-free)")
        new = di.rebuild_index(dest, spec, prefix_len=args.prefix_len)
        print(f"dedup-index {spec.name}: rebucketed to prefix_len="
              f"{new.prefix_len}; update the spec YAML to match")
    elif args.action == "pairs":
        ids = ([int(x) for x in args.ids.split(",")] if args.ids else None)
        stats: dict = {}
        v = di.pairs_view(dest, spec, ids=ids,
                          stats_out=stats if ids else None)
        if v is not None:
            for line in v.orderBy("id_a", "id_b").toJSON().collect():
                print(line)
        if ids and "probe_files" in stats:
            print(f"# probe read {stats['probe_files']}/"
                  f"{stats['live_files']} files")
    else:
        v = di.index_view(dest, spec)
        if v is not None:
            for line in (v.select("doc_id", "bkeys").orderBy("doc_id")
                         .toJSON().collect()):
                print(line)
    return 0


def cmd_ann_index(args) -> int:
    """Maintain an incremental IVF ANN index from a YAML spec
    (streaming/ann_index.py). Actions:

      sync     one maintenance pass: first pass trains the frozen
               quantizer on its delta, every pass assigns the delta
               map-side and appends cell-bucketed vec rows atomically
               with cursors (rerun = no-op)
      compact  range-cluster the index pool by cell so ann_query reads
               only probed cells' files
      delete   tombstone --ids out of the LATEST state (one O(1)
               commit; masked at query time, folded at compact/rebuild)
      health   sampled avg recall@10 vs --min-recall (+ cell balance);
               JSON verdict recommending rebuild when degraded
      rebuild  retrain the quantizer over the FULL stored corpus and
               re-shard every vector in one atomic base commit (the
               retrain path of the frozen-quantizer contract; use
               --n-cells to re-shard finer as the corpus grows)
      recall   measure retrieval quality: recall@10 of ann_query vs
               exact top-k over the stored corpus, printed per nprobe
               in 1,2,4,..,n_cells (JSON lines)
      cells    print per-cell vector counts as JSON lines

    Spec YAML: see streaming.ann_index.load_ann_spec docstring.
    """
    from pyspark.sql import functions as F

    from zync_spark.streaming import ann_index as ai

    spec, doc = ai.load_ann_spec(args.spec)
    spark = _spark()
    dest = _pool(spark, args.lake, doc["dest"], create=True)
    if args.action == "sync":
        src = _pool(spark, args.lake, doc["source"])
        n = ai.sync_ann(src, dest, spec, list(doc["topics"]),
                        auto_compact_every=args.auto_compact)
        print(f"ann-index {spec.name}: {n} rows committed")
    elif args.action == "compact":
        n = ai.compact_ann(dest)
        print(f"ann-index {spec.name}: compacted {n} rows")
    elif args.action == "rebuild":
        so: dict = {}
        n = ai.rebuild_ann(dest, spec, n_cells=args.n_cells,
                           iterations=args.iterations, init=args.init,
                           stats_out=so)
        print(f"ann-index {spec.name}: rebuilt {n} rows"
              + (f" at {args.n_cells} cells" if args.n_cells else "")
              + (f" — occupancy mean {so['mean_cell_occupancy']} / max "
                 f"{so['max_cell_occupancy']} over {so['cells_used']} "
                 f"cells (balance {so['cell_balance']})"
                 if so.get("cells_used") else ""))
    elif args.action == "delete":
        if not args.ids:
            raise SystemExit("ann-index delete requires --ids ID,ID")
        n = ai.tombstone_ann(dest, spec,
                             [int(x) for x in args.ids.split(",")])
        print(f"ann-index {spec.name}: {n} tombstone rows committed")
    elif args.action == "health":
        from zync_spark.streaming.health import check_ann_health

        print(json.dumps(check_ann_health(
            dest, spec, sample=args.queries,
            min_recall=args.min_recall,
            max_mean_occupancy=args.max_mean_occupancy,
            max_balance=args.max_balance)))
    elif args.action == "recall":
        cents = ai.stored_centroids(dest, spec)
        if cents is None:
            raise SystemExit(f"ann-index {spec.name}: index is empty")
        stored = dest.scan().filter(ai._is_vec(spec))
        qs = stored.select("vec_id", F.col("v").alias("emb")).limit(
            args.queries)
        n_cells = len(cents)
        nprobe, probes = 1, []
        while nprobe < n_cells:
            probes.append(nprobe)
            nprobe *= 2
        probes.append(n_cells)
        # the exact side is nprobe-independent and the dominant cost:
        # compute it once, reuse across the sweep
        exact = ai.ann_exact_topk(dest, spec, qs, id_col="vec_id",
                                  vec_col="emb", k=10).persist()
        try:
            for np_ in probes:
                avg = (ai.ann_recall(dest, spec, qs, id_col="vec_id",
                                     vec_col="emb", k=10, nprobe=np_,
                                     exact=exact)
                       .agg(F.avg("recall").alias("a")).collect()[0]["a"])
                print(json.dumps({"nprobe": np_,
                                  "avg_recall_at10": round(avg, 4)}))
        finally:
            exact.unpersist()
    else:
        df = dest.scan()
        if df is not None and "cell" in df.columns:
            for line in (df.filter(ai._is_vec(spec)).groupBy("cell")
                         .agg(F.count("*").alias("n_vecs"))
                         .orderBy("cell").toJSON().collect()):
                print(line)
    return 0


def cmd_embdedup_index(args) -> int:
    """Maintain/query an incremental embedding near-dup (SemDeDup)
    index from a YAML spec (streaming/embdedup_index.py — the fifth
    index family, round 8). Actions:

      sync     one maintenance pass: first pass trains the frozen
               k-means blocks on its delta, every pass assigns the
               delta map-side and emits within-cell cosine pairs from
               (new x new) + (new x stored probed cells), committed
               atomically with cursors (rerun = no-op). --upsert runs
               the one-call CDC path
      compact  range-cluster by cell/bucket + fold tombstones
      delete   tombstone --ids out of the LATEST state (pairs die when
               EITHER member does)
      health   blocking pair-recall (exact best-neighbor sample vs
               co-location) vs --min-pair-recall, plus mean cell
               occupancy vs --max-mean-occupancy (n_cells is frozen at
               creation, so cells fatten as the corpus grows; the
               verdict recommends rebuild --n-cells ~sqrt(N)); JSON
               verdict. COST NOTE: the recall side is an exact
               sample x corpus scan — a maintenance pass, priced like
               a compaction decision; size the cadence for the corpus,
               do not cron it per-minute on a 100-TB pool
      rebuild  retrain the blocks over the FULL stored corpus and
               re-emit the pair set in one atomic base commit
      pairs    print the live near-dup pairs as JSON lines
               (--ids bounds the read to those canonical smaller
               members' buckets)

    Spec YAML: see streaming.embdedup_index.load_embdedup_spec.
    """
    from zync_spark.streaming import embdedup_index as ed

    spec, doc = ed.load_embdedup_spec(args.spec)
    spark = _spark()
    dest = _pool(spark, args.lake, doc["dest"], create=True)
    if args.action == "sync":
        src = _pool(spark, args.lake, doc["source"])
        stats: dict = {}
        n = ed.sync_embdedup(src, dest, spec, list(doc["topics"]),
                             stats_out=stats,
                             auto_compact_every=args.auto_compact,
                             upsert=args.upsert)
        probe = (f" (probe read {stats['probe_files']}/"
                 f"{stats['live_files']} files)"
                 if "probe_files" in stats else "")
        print(f"embdedup-index {spec.name}: {n} rows committed{probe}")
    elif args.action == "compact":
        n = ed.compact_embdedup(dest)
        print(f"embdedup-index {spec.name}: compacted {n} rows")
    elif args.action == "rebuild":
        so: dict = {}
        n = ed.rebuild_embdedup(dest, spec, n_cells=args.n_cells,
                                iterations=args.iterations,
                                init=args.init, stats_out=so)
        print(f"embdedup-index {spec.name}: rebuilt {n} rows"
              + (f" at {args.n_cells} cells" if args.n_cells else "")
              + (f" — occupancy mean {so['mean_cell_occupancy']} / max "
                 f"{so['max_cell_occupancy']} over {so['cells_used']} "
                 f"cells (balance {so['cell_balance']})"
                 if so.get("cells_used") else ""))
    elif args.action == "delete":
        if not args.ids:
            raise SystemExit("embdedup-index delete requires --ids ID,ID")
        n = ed.tombstone_embdedup(dest, spec,
                                  [int(x) for x in args.ids.split(",")])
        print(f"embdedup-index {spec.name}: {n} tombstone rows committed")
    elif args.action == "health":
        from zync_spark.streaming.health import check_embdedup_health

        print(json.dumps(check_embdedup_health(
            dest, spec, min_pair_recall=args.min_pair_recall,
            max_mean_occupancy=args.max_mean_occupancy,
            max_balance=args.max_balance)))
    else:  # pairs
        ids = ([int(x) for x in args.ids.split(",")] if args.ids
               else None)
        view = ed.pairs_view(dest, spec, ids=ids)
        if view is not None:
            for line in (view.orderBy("id_a", "id_b")
                         .toJSON().collect()):
                print(line)
    return 0


def cmd_text_index(args) -> int:
    """Maintain/query an incremental BM25 text index from a YAML spec
    (streaming/text_index.py). Actions:

      sync     one maintenance pass: tokenize the cursor-bounded delta
               map-side, append term-bucketed postings + doc lengths +
               corpus-stat partials atomically with cursors (rerun =
               no-op)
      compact  range-cluster the index pool by bucket
      search   BM25 top-k for --query terms (reads only the terms'
               posting buckets); JSON lines (doc_id, rank, score)
      rebuild  re-bucket postings/dlens at a new --prefix-len in place
      delete   tombstone --ids out of the LATEST state (one bounded
               commit; a negative corpus-stat partial keeps BM25
               exact) — the CDC update flow is delete, republish, sync
      health   one-term read amplification vs --max-terms-per-bucket;
               JSON verdict recommending rebuild when oversubscribed

    Spec YAML: see streaming.text_index.load_text_spec docstring.
    """
    from zync_spark.streaming import text_index as ti

    spec, doc = ti.load_text_spec(args.spec)
    spark = _spark()
    dest = _pool(spark, args.lake, doc["dest"], create=True)
    if args.action == "sync":
        src = _pool(spark, args.lake, doc["source"])
        n = ti.sync_text(src, dest, spec, list(doc["topics"]),
                         auto_compact_every=args.auto_compact)
        print(f"text-index {spec.name}: {n} rows committed")
    elif args.action == "compact":
        n = ti.compact_text(dest)
        print(f"text-index {spec.name}: compacted {n} rows")
    elif args.action == "rebuild":
        if args.prefix_len is None:
            raise SystemExit("text-index rebuild requires --prefix-len")
        new = ti.rebuild_text(dest, spec, prefix_len=args.prefix_len)
        print(f"text-index {spec.name}: rebucketed to prefix_len="
              f"{new.prefix_len}; update the spec YAML to match")
    elif args.action == "delete":
        if not args.ids:
            raise SystemExit("text-index delete requires --ids ID,ID")
        n = ti.tombstone_text(dest, spec,
                              [int(x) for x in args.ids.split(",")])
        print(f"text-index {spec.name}: {n} tombstone rows committed")
    elif args.action == "health":
        from zync_spark.streaming.health import check_text_health

        print(json.dumps(check_text_health(
            dest, spec,
            max_terms_per_bucket=args.max_terms_per_bucket)))
    else:
        if not args.query:
            raise SystemExit("text-index search requires --query")
        for line in (ti.search_text(dest, spec, args.query, k=args.k)
                     .toJSON().collect()):
            print(line)
    return 0


def cmd_span_index(args) -> int:
    """Maintain/query an incremental duplicated-span index from a YAML
    spec (streaming/span_index.py — the ExactSubstr operator's O(delta)
    maintenance path). Actions:

      sync     one maintenance pass: window-hash the cursor-bounded
               delta, probe only the colliding hash buckets, append
               window rows + newly duplicated hit positions + dup
               markers atomically with cursors (rerun = no-op)
      compact  range-cluster the index pool by bucket
      spans    the accumulated maximal spans (== the batch operator
               over the full corpus); --docs limits the read to those
               documents' hit buckets; JSON lines
      rebuild  change --min-docs (hits re-derived from stored windows)
               and/or --prefix-len (re-bucket) in place, source-free;
               window needs a source re-ingest (burned into hashes)
      delete   tombstone --ids out of the LATEST state — also RETRACTS
               the duplication status of surviving docs whose spans
               lost their only partner (bounded by the dying docs'
               hash buckets; requires the forward key space — legacy
               pools: rebuild once)
      health   probe-saturation projection for the typical delta vs
               --max-coverage; JSON verdict with the prefix_len the
               sizing rule recommends when saturated

    Spec YAML: see streaming.span_index.load_span_spec docstring.
    """
    from zync_spark.streaming import span_index as si

    spec, doc = si.load_span_spec(args.spec)
    spark = _spark()
    dest = _pool(spark, args.lake, doc["dest"], create=True)
    if args.action == "sync":
        src = _pool(spark, args.lake, doc["source"])
        n = si.sync_spans(src, dest, spec, list(doc["topics"]),
                          auto_compact_every=args.auto_compact)
        print(f"span-index {spec.name}: {n} rows committed")
    elif args.action == "compact":
        n = si.compact_spans(dest)
        print(f"span-index {spec.name}: compacted {n} rows")
    elif args.action == "rebuild":
        if args.min_docs is None and args.prefix_len is None:
            raise SystemExit("span-index rebuild requires --min-docs "
                             "and/or --prefix-len (window cannot change "
                             "source-free: it is burned into the hashes)")
        new = si.rebuild_spans(dest, spec, min_docs=args.min_docs,
                               prefix_len=args.prefix_len)
        print(f"span-index {spec.name}: rebuilt to min_docs="
              f"{new.min_docs} prefix_len={new.prefix_len}; update the "
              "spec YAML to match")
    elif args.action == "delete":
        if not args.ids:
            raise SystemExit("span-index delete requires --ids ID,ID")
        stats: dict = {}
        n = si.tombstone_spans(dest, spec,
                               [int(x) for x in args.ids.split(",")],
                               stats_out=stats)
        probe = (f" (probe read {stats['probe_files']}/"
                 f"{stats['live_files']} files)"
                 if "probe_files" in stats else "")
        print(f"span-index {spec.name}: {n} tombstone/retraction rows "
              f"committed{probe}")
    elif args.action == "health":
        from zync_spark.streaming.health import check_span_health

        print(json.dumps(check_span_health(
            dest, spec, max_coverage=args.max_coverage)))
    else:
        ids = ([int(x) for x in args.docs.split(",")]
               if args.docs else None)
        view = si.spans_view(dest, spec, doc_ids=ids)
        ordered = view.orderBy("doc_id", "span_start")
        for line in ordered.toJSON().collect():
            print(line)
    return 0


def cmd_retrieve(args) -> int:
    """Hybrid retrieval over a text index AND an ANN index: BM25 top-N
    for --query fused with cosine top-N for the query vector by
    reciprocal-rank fusion (functions/retrieval.rrf_fuse — the catalog's
    hybrid_retrieval_rrf as a lake command). With a SINGLE ann-index
    spec (round 8): ANN-ONLY retrieval — no fusion, top-k cosine
    neighbors printed directly, with --where resolving from the ANN
    pool's own index-resident attrs (the text-less deployment).

    The two indexes must share an id space (the text index's doc ids
    and the ANN index's vec ids name the same documents). The query
    vector is --vec '[j,s,o,n]' or --vec-id N (that stored vector; it is
    excluded from its own neighbors). Each leg reads only its bounded
    probe set (posting buckets / probed cells); the fusion joins two
    N-row lists. Prints k fused JSON lines
    (doc_id, lex_rank, sem_rank, rrf, rank) — or, ANN-only,
    (doc_id, cos, rank)."""
    from pyspark.sql import functions as F

    from zync_spark.functions.retrieval import rrf_fuse
    from zync_spark.streaming import ann_index as ai
    from zync_spark.streaming import text_index as ti

    if args.vec is not None and args.vec_id is not None:
        raise SystemExit("retrieve: pass --vec or --vec-id, not both "
                         "(their self-exclusion semantics differ)")
    if args.vec is None and args.vec_id is None:
        raise SystemExit("retrieve requires --vec or --vec-id")
    # spec dispatch by CONTENT, not position: a text spec says kind:
    # text, an ann spec carries `vec` (and no other kind) — so both
    # `retrieve text.yaml ann.yaml` (hybrid, the round-6 form) and
    # `retrieve ann.yaml` (ANN-only) parse unambiguously
    import yaml as _yaml

    tspec = tdoc = aspec = adoc = None
    if len(args.spec) > 2:
        raise SystemExit("retrieve takes one (ann) or two (text + ann) "
                         "index spec YAMLs")
    for path in args.spec:
        with open(path) as f:
            probe = _yaml.safe_load(f)
        if probe.get("kind") == "text":
            tspec, tdoc = ti.load_text_spec(path)
        elif "vec" in probe and probe.get("kind") is None:
            aspec, adoc = ai.load_ann_spec(path)
        else:
            raise SystemExit(
                f"retrieve: {path} is neither a text-index nor an "
                "ann-index spec")
    if aspec is None:
        raise SystemExit("retrieve requires an ann-index spec")
    if tspec is None and args.query:
        raise SystemExit("retrieve: --query needs a text-index spec "
                         "(BM25 has no ANN-only form)")
    if tspec is not None and not args.query:
        raise SystemExit("retrieve: hybrid retrieval requires --query")
    spark = _spark()
    tdest = _pool(spark, args.lake, tdoc["dest"]) if tdoc else None
    adest = _pool(spark, args.lake, adoc["dest"])
    # resolve the query vector FIRST: search_text runs eagerly (bucket
    # probes + metadata collects), wasted work if the vector is bad
    if args.vec is not None:
        try:
            vec = json.loads(args.vec)
        except ValueError:
            vec = None
        if not isinstance(vec, list) or not vec or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                for x in vec):
            raise SystemExit("retrieve: --vec must be a JSON number array")
        qvec = [float(x) for x in vec]
        qid = -1
    else:
        stored = adest.scan()
        if stored is None or "vec_id" not in stored.columns:
            raise SystemExit(f"retrieve: ANN index {aspec.name!r} is empty")
        rows = (stored.filter(ai._is_vec(aspec)
                              & (F.col("vec_id") == args.vec_id))
                .select("v").take(1))
        if not rows:
            raise SystemExit(f"retrieve: vec_id {args.vec_id} not in index")
        # re-wrap as a 1-row LOCAL frame: ann_query evaluates its query
        # frame more than once, and the lookup plan above is a full
        # index scan — paying it once here keeps the query path bounded
        qvec = [float(x) for x in rows[0]["v"]]
        qid = args.vec_id
    qs = spark.createDataFrame([(qid, qvec)], "vec_id long, emb array<double>")
    where_ids = None
    if args.where:
        # metadata predicate (the indexes share an id space by contract,
        # so one allowed-id frame serves every leg). The legs semi-join
        # their bounded candidates against it (exact for BM25
        # post-intersection; exact within the probed cells for ANN —
        # raise --nprobe to trade cost for recall under selective
        # filters).
        # Index-resident attrs first (metadata co-location; since round
        # 8 the 'a:' surface is spec-agnostic — streaming/attrs.py):
        # the text index's attrs, then the ANN index's own — so a
        # TEXT-LESS deployment still resolves the filter from an index
        # pool ALONE (a bounded 'a:' read of narrow rows). Only when no
        # spec declares attrs does this fall back to scanning the
        # SOURCE pool's metadata, which at 100 TB costs a
        # corpus-metadata read per retrieve (the reason attrs exist).
        from zync_spark.streaming.health import EmptyIndexError

        try:
            if tspec is not None:
                where_ids = ti.attr_ids(tdest, tspec, args.where)
                where_source = "index-attrs"
            else:
                raise EmptyIndexError("no text index")
        except EmptyIndexError:
            try:
                where_ids = ai.attr_ids(adest, aspec, args.where)
                where_source = "index-attrs(ann)"
            except EmptyIndexError:
                where_ids = None
            except Exception as e:
                # mirror the text path: a coverage-guard ValueError or a
                # bad-predicate AnalysisException must surface as the
                # friendly error, not a raw traceback (round-8 ADVICE)
                raise SystemExit(f"retrieve: bad --where predicate: {e}")
        except Exception as e:
            raise SystemExit(f"retrieve: bad --where predicate: {e}")
    if args.where and where_ids is None:
        where_source = "source-pool"
        src_doc, src_id = ((tdoc, tspec.id_expr) if tdoc is not None
                           else (adoc, aspec.id_expr))
        meta = _pool(spark, args.lake, src_doc["source"]).scan()
        if meta is None:
            raise SystemExit("retrieve: --where given but the "
                             "source pool is empty")
        try:
            # LATEST version per id first, THEN the predicate: under
            # upsert CDC a superseded version's metadata could
            # otherwise admit a doc whose current version no longer
            # matches (and the indexes only answer for current
            # versions). Round-6 ADVICE. Null-id rows (co-tenant
            # topics, markers) are not entities — excluded, not
            # collapsed to one arbitrary survivor. Offsets are
            # per-partition sequences, so an id spread across
            # partitions has NO version order — refused loudly,
            # the same contract as keep_latest_versions
            # (round-7 review: a silent cross-partition 'latest'
            # picks an arbitrary, possibly stale version).
            from pyspark.sql import Window

            ided = meta.filter(F.expr(src_id).isNotNull())
            multi = (ided.groupBy(
                F.expr(src_id).alias("__id"))
                .agg(F.count_distinct("kafka.partition").alias("__np"))
                .filter(F.col("__np") > 1).limit(1).collect())
            if multi:
                raise SystemExit(
                    f"retrieve: --where over the source pool needs a "
                    f"latest-version-per-id reduction, but id "
                    f"{multi[0]['__id']!r} appears in multiple "
                    "partitions — offsets are per-partition "
                    "sequences, so no version order exists; key the "
                    "CDC topic by id, or declare index-resident "
                    "attrs: in the index spec")
            w = Window.partitionBy(F.expr(src_id)).orderBy(
                F.col("kafka.offset").desc())
            latest = (ided.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") == 1).drop("__rn"))
            where_ids = latest.filter(F.expr(args.where)).select(
                F.expr(src_id).cast("long").alias("doc_id"))
        except SystemExit:
            raise
        except Exception as e:
            raise SystemExit(f"retrieve: bad --where predicate: {e}")
    tstats: dict = {}
    astats: dict = {}
    if tspec is None:
        # ANN-only retrieval (round 8): no fusion — print the top-k
        # cosine neighbors directly. The --where filter above resolved
        # from the ANN pool's own attrs when the spec declares them.
        sem = ai.ann_query(adest, aspec, qs, id_col="vec_id",
                           vec_col="emb", k=args.k, nprobe=args.nprobe,
                           stats_out=astats if args.explain else None,
                           where_ids=where_ids)
        for r in (sem.select(F.col("neighbor_id").alias("doc_id"),
                             "cos", "rank")
                  .orderBy("rank").collect()):
            print(json.dumps(r.asDict()))
        if args.explain and "probe_files" in astats:
            print(f"# semantic probe read {astats['probe_files']}/"
                  f"{astats['live_files']} files")
        if args.explain and args.where:
            print(f"# where filter resolved from {where_source}")
        return 0
    # the legs are independent and each pays a few serial driver jobs
    # (manifest reads, metadata collects) before returning — run them
    # concurrently; Spark job submission is thread-safe
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        lex_f = pool.submit(
            ti.search_text, tdest, tspec, args.query, k=args.n,
            stats_out=tstats if args.explain else None,
            where_ids=where_ids)
        sem_f = pool.submit(
            ai.ann_query, adest, aspec, qs, id_col="vec_id", vec_col="emb",
            k=args.n, nprobe=args.nprobe,
            stats_out=astats if args.explain else None,
            where_ids=where_ids)
        lex = lex_f.result().select("doc_id", "rank")
        sem = sem_f.result().select(
            F.col("neighbor_id").alias("doc_id"), "rank")
    weights = None
    if args.weights:
        try:
            weights = [float(x) for x in args.weights.split(",")]
        except ValueError:
            weights = None
        if weights is None or len(weights) != 2:
            raise SystemExit(
                "retrieve: --weights must be two comma-separated numbers "
                "(lexical,semantic)")
    fused = rrf_fuse([lex, sem], names=["lex_rank", "sem_rank"],
                     k=args.k, c=args.c, weights=weights)
    # not toJSON(): it drops null fields, and an absent-from-one-ranker
    # null IS the signal here. Explicit orderBy: collect order after a
    # post-window filter is not an API guarantee.
    for r in fused.orderBy("rank").collect():
        print(json.dumps(r.asDict()))
    if args.explain and "probe_files" in tstats:
        print(f"# lexical probe read {tstats['probe_files']}/"
              f"{tstats['live_files']} files "
              f"(+{tstats.get('dlen_files', 0)} dlen)")
    if args.explain and "probe_files" in astats:
        print(f"# semantic probe read {astats['probe_files']}/"
              f"{astats['live_files']} files")
    if args.explain and args.where:
        # which side paid for the filter: index-resident attrs (bounded
        # 'a:' read, no source scan) or the source-pool fallback
        print(f"# where filter resolved from {where_source}")
    return 0


def cmd_types(args) -> int:
    """Print a pool's named-type registry (types.json sidecar): one JSON
    line {path, name} per decoration — the nested named-type decorators
    the unified schema carries out-of-band (no Spark session needed)."""
    sidecar = os.path.join(args.lake, args.pool, "types.json")
    if not os.path.isdir(os.path.join(args.lake, args.pool)):
        raise SystemExit(f"zync-spark: no such pool {args.pool!r} in {args.lake!r}")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            for path, name in sorted(json.load(f).items()):
                print(json.dumps({"path": path, "name": name}))
    return 0


def cmd_log(args) -> int:
    """Print a pool's commit log (one JSON line per manifest, newest
    last): seq, message, rows, base flag, per-topic offset stats,
    cursors, wall-clock ts — the lakehouse `DESCRIBE HISTORY` over the
    manifest files (no Spark session needed)."""
    import glob

    commit_dir = os.path.join(args.lake, args.pool, "_commits")
    if not os.path.isdir(commit_dir):
        raise SystemExit(f"zync-spark: no such pool {args.pool!r} in {args.lake!r}")
    for path in sorted(
        glob.glob(os.path.join(commit_dir, "*.json")),
        key=lambda p: int(os.path.basename(p).split(".")[0]),
    ):
        with open(path) as f:
            m = json.load(f)
        print(json.dumps({
            "seq": int(os.path.basename(path).split(".")[0]),
            "message": m.get("message", ""),
            "rows": m.get("rows"),
            "base": bool(m.get("base")),
            "files": len(m.get("files", [])),
            "stats": m.get("stats"),
            "cursors": m.get("cursors"),
            "ts": m.get("ts"),
        }))
    return 0


def cmd_profile(args) -> int:
    """Profile a pool's columns (generic single-pass SUMMARIZE,
    functions/profile.py): one JSON line per leaf column with
    row/non-null/distinct counts, min/max, and sketch p50/p95 for
    numeric leaves."""
    from zync_spark.functions.profile import profile

    spark = _spark()
    df = _pool(spark, args.lake, args.pool).scan()
    if df is None:
        return 0
    if args.where:
        from pyspark.sql import functions as F  # noqa: F401
        from zync_spark import zedexpr

        df = df.filter(zedexpr.compile_expr(args.where, zedexpr.Context()))
    res = profile(df, columns=args.columns or None, exact=not args.approx)
    for line in res.orderBy("col").toJSON().collect():
        print(line)
    return 0


def cmd_produce(args) -> int:
    """Load JSON-lines envelope records from files into a pool
    (broker-less analog of cmd/zync/produce).

    `--schema` takes a Spark DDL string; without it the schema is inferred,
    which silently DROPS all-null fields (plain JSON is schema-lossy, which
    is exactly why the reference feeds typed ZSON to produce — and why
    `--format zson` reads the reference's own .zson files: typed values,
    fused null-padded schema, decorators into the pool registry)."""
    spark = _spark()
    pool = _pool(spark, args.lake, args.pool, create=True)
    if args.format == "zson":
        from zync_spark import zson

        import os as _os

        total = 0
        for path in args.files:
            if _os.path.getsize(path) > 64 << 20:
                # past the driver-parse guard: distributed line-delimited
                # path (pretty-printed big files fail with a clear error)
                df, names = zson.read_lines(spark, path)
            else:
                df, names = zson.read(spark, path)
            total += pool.load(df, f"produce {path}", type_names=names)
        print(f"loaded {total} records")
        return 0
    reader = spark.read
    if args.schema:
        reader = reader.schema(args.schema)
    if args.format == "parquet":
        df = reader.parquet(*args.files)
    else:
        df = reader.json(args.files)
    n = pool.load(df, f"produce {','.join(args.files)}")
    print(f"loaded {n} records")
    return 0


def cmd_ls(args) -> int:
    """List registry subjects with latest id/version/schema — the exact
    output shape of the reference (cmd/zync/ls/command.go:53-60). With no
    --registry, connection/auth come from ~/.zync/schema_registry.json
    (the reference's config file)."""
    from zync_spark.sources.registry import (
        HttpRegistry,
        load_registry_config,
        registry_from_config,
    )

    if args.registry:
        cfg = load_registry_config()
        reg = HttpRegistry(
            args.registry, user=cfg.get("user"), password=cfg.get("password")
        )
    else:
        reg = registry_from_config()
    for s in reg.subjects():
        print(f"subject {s}:")
        latest = reg.latest(s)
        print(f"  id {latest['id']}")
        print(f"  version {latest['version']}")
        print(f"  schema {json.dumps(latest['schema'])}")
    return 0


def _schemas(args):
    from pyspark.sql.types import StructType

    return StructType.fromDDL(args.key_schema), StructType.fromDDL(args.value_schema)


def cmd_from_kafka(args) -> int:
    """Continuous topic → pool sync (reference cmd/zync/from-kafka).

    `--transport file:DIR` runs the identical Structured Streaming loop
    over a FileQueue directory (broker-less dev/test); the default kafka
    transport needs the spark-sql-kafka connector on the classpath."""
    spark = _spark()
    from zync_spark.streaming.from_kafka import FromKafka

    pool = _pool(spark, args.lake, args.pool or args.topic, create=True)
    key_t, val_t = _schemas(args)
    rollups = []
    for spec_path in args.rollup or []:
        from zync_spark.streaming.incremental import load_rollup_spec

        spec, doc = load_rollup_spec(spec_path)
        dest = _pool(spark, args.lake, doc["dest"], create=True)
        rollups.append((spec, dest, list(doc.get("topics") or [args.topic])))
    indexes = []
    for spec_path in args.index or []:
        # index spec YAMLs are distinguished by their fields: `vec` names
        # an ann-index; `kind: text` names a BM25 text index (its other
        # fields are a subset of the dedup spec's, so it must say so);
        # anything else is a dedup-index. FromKafka dispatches on type.
        import yaml as _yaml

        with open(spec_path) as f:
            probe = _yaml.safe_load(f)
        if probe.get("kind") == "embdedup":
            # checked BEFORE the `vec` probe: embdedup specs carry a
            # `vec` field too and must not dispatch to the ANN loader
            from zync_spark.streaming.embdedup_index import \
                load_embdedup_spec as _load
        elif "vec" in probe:
            from zync_spark.streaming.ann_index import load_ann_spec as _load
        elif probe.get("kind") == "text":
            from zync_spark.streaming.text_index import \
                load_text_spec as _load
        elif probe.get("kind") == "span":
            from zync_spark.streaming.span_index import \
                load_span_spec as _load
        else:
            from zync_spark.streaming.dedup_index import \
                load_index_spec as _load
        spec, doc = _load(spec_path)
        dest = _pool(spark, args.lake, doc["dest"], create=True)
        indexes.append((spec, dest, list(doc.get("topics") or [args.topic])))
    fk = FromKafka(
        spark, {args.topic: pool}, key_t, val_t,
        format=args.format, shaper=args.shaper,
        rollups=rollups, indexes=indexes,
        auto_compact_every=args.auto_compact,
        upsert_indexes=args.upsert_indexes,
        health_every=args.health_every,
        auto_rebuild=args.auto_rebuild,
        health_opts=(
            {"pool": {"max_masked_fraction": args.max_masked_fraction}}
            if args.max_masked_fraction is not None else None),
        auto_vacuum_s=args.auto_vacuum_s,
    )
    if args.transport.startswith("file:"):
        from zync_spark.sources.filequeue import FileQueue

        queue = FileQueue(args.transport[len("file:"):])
        q = fk.run(
            frame=queue.stream_frame(spark),
            checkpoint=args.checkpoint or os.path.join(args.lake, "_ckpt", args.topic),
            thresh=args.thresh, interval=args.interval, exit_after=args.exitafter,
        )
    else:
        q = fk.run(thresh=args.thresh, interval=args.interval,
                   exit_after=args.exitafter, checkpoint=args.checkpoint)
    q.awaitTermination()
    print(f"synced topic {args.topic} -> pool {args.pool or args.topic}")
    return 0


def cmd_to_kafka(args) -> int:
    """Pool → topic egress resuming from the transport's high-water mark
    (reference cmd/zync/to-kafka). `--transport file:DIR` produces to a
    FileQueue; kafka needs the connector."""
    spark = _spark()
    from zync_spark.streaming.to_kafka import ToKafka

    pool = _pool(spark, args.lake, args.pool or args.topic)
    key_t, val_t = _schemas(args)
    tk = ToKafka(pool, key_t, val_t, format=args.format,
                 batch_size=args.batch_size,
                 shaper=getattr(args, "shaper", None))
    bulk = getattr(args, "bulk", False)

    def _sync(topic, hwm, produce):
        if bulk:
            return tk.sync_bulk(topic, hwm, produce, page_span=args.page_span)
        return tk.sync(topic, hwm, produce)

    if args.transport.startswith("file:"):
        from zync_spark.sources.filequeue import FileQueue

        queue = FileQueue(args.transport[len("file:"):])
        produced = _sync(args.topic, queue.end_offset(args.topic), queue.produce_frame)
    else:
        from zync_spark.sources.kafka import kafka_available

        if not kafka_available(spark):
            print("kafka connector not available in this deployment", file=sys.stderr)
            return 1
        from zync_spark.sources.kafka import load_kafka_config, read_batch, write_batch

        config = load_kafka_config(args.config)
        frame = read_batch(spark, config, [args.topic])
        from pyspark.sql import functions as F

        row = frame.agg(F.max("offset").alias("mx")).collect()[0]
        hwm = 0 if row["mx"] is None else row["mx"] + 1
        produced = _sync(
            args.topic, hwm, lambda df: write_batch(df, config, args.topic)
        )
    print(f"produced {produced} records to topic {args.topic}")
    return 0


def cmd_compact(args) -> int:
    """Lake maintenance: collapse a pool's commit log into one base
    manifest of large offset-clustered files, optionally reclaiming the
    superseded small files (the streaming small-files problem)."""
    spark = _spark()
    pool = _pool(spark, args.lake, args.pool)
    n = pool.compact(target_rows=args.target_rows,
                     keep_latest_by_key=args.keep_latest_by_key,
                     cluster_by=args.cluster_by or None,
                     zorder=args.zorder)
    msg = f"compacted {n} rows into {len(pool.committed_files())} file(s)"
    if args.vacuum:
        msg += (
            f"; vacuumed {pool.vacuum(retention_s=args.vacuum_retention)} "
            "superseded file(s)"
        )
    print(msg)
    return 0


def cmd_index_pool(args) -> int:
    """Family-agnostic index-pool retention maintenance (round 7).

    Actions:
      health   check_pool_health: masked-row fraction (what a
               fold-compaction would reclaim — measured with the SAME
               fold_tombstones transform the cure applies) + live
               tombstone count vs thresholds; JSON verdict with a
               structured recommendation
      fold     fold_compact: ONE base rewrite that drops masked rows,
               tombstones, and retraction markers for ALL families
               sharing the pool (multi-tenant pools fold together);
               pass --spec (repeatable) when a dedup index lives here
               so its legacy self-heal knows the prefix_len
      vacuum   physically delete superseded data files older than
               --retention seconds (time travel past them stops)

    The streaming maintainer runs the same loop automatically
    (from-kafka --health-every N --auto-rebuild [--auto-vacuum-s S]);
    this command is the manual/one-shot form.
    """
    from zync_spark.streaming.health import EmptyIndexError, check_pool_health
    from zync_spark.streaming.tombstones import fold_compact

    spark = _spark()
    dest = _pool(spark, args.lake, args.pool)
    if args.action == "health":
        try:
            v = check_pool_health(
                dest, max_masked_fraction=args.max_masked_fraction,
                max_tombstones=args.max_tombstones,
                vacuum_after_s=args.retention if args.vacuum else None)
        except EmptyIndexError as e:
            print(json.dumps({"family": "pool", "healthy": True,
                              "empty": True, "note": str(e)}))
            return 0
        print(json.dumps(v))
        return 0 if v["healthy"] else 1
    if args.action == "fold":
        specs = []
        for spec_path in args.spec or []:
            import yaml as _yaml

            with open(spec_path) as f:
                probe = _yaml.safe_load(f)
            if "vec" in probe or probe.get("kind") in ("text", "span",
                                                       "embdedup"):
                continue  # only the dedup family's prefix_len matters
            from zync_spark.streaming.dedup_index import load_index_spec

            specs.append(load_index_spec(spec_path)[0])
        n = fold_compact(dest, specs=specs, target_rows=args.target_rows)
        print(f"index-pool {args.pool}: folded to {n} live rows in "
              f"{len(dest.committed_files())} file(s)")
        return 0
    # vacuum
    n = dest.vacuum(retention_s=args.retention)
    print(f"index-pool {args.pool}: vacuumed {n} superseded file(s)")
    return 0


def cmd_info(args) -> int:
    spark = _spark()
    from zync_spark.sources.kafka import kafka_available, load_kafka_config, read_batch

    if not kafka_available(spark):
        print("kafka connector not available in this deployment", file=sys.stderr)
        return 1
    from pyspark.sql import functions as F

    frame = read_batch(spark, load_kafka_config(args.config), args.topics)
    stats = (
        frame.groupBy("topic")
        .agg(F.min("offset").alias("low"), F.max("offset").alias("high"))
        .collect()
    )
    for r in stats:
        print(json.dumps({"topic": r["topic"], "low": r["low"], "high": r["high"] + 1}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="zync-spark")
    ap.add_argument("--lake", default="./lake", help="lake root directory")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("etl", help="run one transactional ETL pass")
    p.add_argument("config")
    p.add_argument("--message", default="etl")
    p.add_argument("--plan", action="store_true",
                   help="print the compiled physical plan instead of running")
    p.add_argument("--zed", action="store_true",
                   help="print the generated zed program instead of running "
                        "(the reference's `zync etl -zed`)")
    p.set_defaults(fn=cmd_etl)

    p = sub.add_parser("query", help="SQL or zed pipeline over lake pools")
    p.add_argument("sql", nargs="?", default=None)
    p.add_argument("-I", "--include", default=None, metavar="FILE",
                   help="read the program from FILE (the reference's "
                        "`zed query -I demo/update.zed`); implies --zed")
    p.add_argument("--zed", action="store_true",
                   help="treat the query as a zed pipeline "
                        "(from pool | where ... | ...) instead of SQL")
    p.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan instead of rows")
    p.add_argument("-z", action="store_true",
                   help="print rows as ZSON text (the reference's "
                        "`zed query -z` output form)")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("consume", help="dump topic records from a pool")
    p.add_argument("topic")
    p.add_argument("--pool", required=True)
    p.add_argument("--offset", type=int, default=0)
    p.add_argument("--at", type=int, default=None,
                   help="time-travel: read the pool as of this commit seq")
    p.add_argument("--at-ts", type=float, default=None,
                   help="time-travel: read as of this unix timestamp "
                        "(last commit at or before it)")
    p.add_argument("--where", default=None,
                   help="zed filter expression over the envelope "
                        '(e.g. \'value.after.id > 5 and kafka.offset < 100\')')
    p.add_argument("--format", default="json",
                   choices=["json", "csv", "parquet", "zson"],
                   help="output format (reference -f; csv flattens the "
                        "envelope to dotted columns; zson prints the "
                        "reference's own text form with named-type "
                        "decorators from the pool registry)")
    p.add_argument("--out", default=None,
                   help="write via Spark to this path instead of stdout "
                        "(distributed, no driver collect)")
    p.set_defaults(fn=cmd_consume)

    p = sub.add_parser("produce", help="load envelope JSON files into a pool")
    p.add_argument("files", nargs="+")
    p.add_argument("--pool", required=True)
    p.add_argument("--schema", default=None,
                   help="Spark DDL schema for the JSON records (inference "
                        "drops all-null fields)")
    p.add_argument("--format", default="json",
                   choices=["json", "parquet", "zson"],
                   help="input file format (zson reads the reference's "
                        "typed text form, incl. its demo/ztest files)")
    p.set_defaults(fn=cmd_produce)

    p = sub.add_parser("ls", help="list schema registry subjects")
    p.add_argument("--registry", default=None,
                   help="registry URL (default: ~/.zync/schema_registry.json "
                        "or http://localhost:8081)")
    p.set_defaults(fn=cmd_ls)

    def _transport_args(p):
        p.add_argument("topic")
        p.add_argument("--pool", default=None, help="pool name (default: topic)")
        p.add_argument("--key-schema", required=True, help="Spark DDL for keys")
        p.add_argument("--value-schema", required=True, help="Spark DDL for values")
        p.add_argument("--format", default="json", choices=["json", "avro"])
        p.add_argument("--transport", default="kafka",
                       help="'kafka' (needs connector) or 'file:DIR' (FileQueue)")

    p = sub.add_parser("from-kafka", help="continuous topic -> pool sync")
    _transport_args(p)
    p.add_argument("--thresh", type=int, default=1_048_576)
    p.add_argument("--interval", default="5 seconds")
    p.add_argument("--exitafter", action="store_true",
                   help="drain what is available, then stop (reference -exitafter)")
    p.add_argument("--shaper", default=None, help="zed shaper snippet")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--rollup", action="append", default=None,
                   help="rollup spec YAML to keep in sync after every "
                        "micro-batch (repeatable; streaming materialized "
                        "view)")
    p.add_argument("--index", action="append", default=None,
                   help="dedup-index, ann-index, text-index (kind: text), "
                        "span-index (kind: span), or embedding-near-dup "
                        "index (kind: embdedup) spec YAML to keep in sync "
                        "after every micro-batch (repeatable)")
    p.add_argument("--auto-compact", type=int, default=None, metavar="N",
                   help="fold ingest AND index pools into a base manifest "
                        "every N delta commits (the recommended cadence: "
                        "bounded probes degrade without it)")
    p.add_argument("--upsert-indexes", action="store_true",
                   help="CDC semantics for --index entries: re-published "
                        "ids replace their previous versions (same-commit "
                        "tombstones) instead of accumulating")
    p.add_argument("--health-every", type=int, default=None, metavar="N",
                   help="run each --index entry's health check every N "
                        "index-syncing micro-batches (unhealthy verdicts "
                        "warn with the JSON verdict)")
    p.add_argument("--auto-rebuild", action="store_true",
                   help="with --health-every: APPLY the structured "
                        "rebuild recommendation when a check fails (the "
                        "ingest loop is the single writer, so the "
                        "rebuild's OCC publish cannot collide)")
    p.add_argument("--max-masked-fraction", type=float, default=None,
                   metavar="F",
                   help="with --health-every: retention threshold — when "
                        "more than this fraction of an index pool's rows "
                        "are dead (tombstone-masked), recommend (and with "
                        "--auto-rebuild, run) a fold-compaction "
                        "(default 0.2)")
    p.add_argument("--auto-vacuum-s", type=float, default=None, metavar="S",
                   help="after a retention-driven fold-compaction, "
                        "physically delete superseded data files older "
                        "than S seconds (Pool.vacuum retention window; "
                        "time travel past the fold stops working)")
    p.set_defaults(fn=cmd_from_kafka)

    p = sub.add_parser("to-kafka", help="pool -> topic egress from the HWM")
    _transport_args(p)
    p.add_argument("--batch-size", type=int, default=200)
    p.add_argument("--shaper", default=None,
                   help="zed pipeline applied to each egress page "
                        "(fifo/lake.go:84-92); must preserve the envelope "
                        "columns")
    p.add_argument("--bulk", action="store_true",
                   help="backfill mode: offset-range pages (--page-span) "
                        "instead of 200-row pages — one produce per span")
    p.add_argument("--page-span", type=int, default=100_000)
    p.add_argument("--config", default=None)
    p.set_defaults(fn=cmd_to_kafka)

    p = sub.add_parser("ann-index", help="incremental IVF ANN index")
    p.add_argument("action",
                   choices=["sync", "compact", "rebuild", "recall", "cells",
                            "delete", "health"])
    p.add_argument("--min-recall", type=float, default=0.5,
                   help="health: flag when sampled avg recall@10 drops "
                        "below this")
    p.add_argument("--ids", default=None, metavar="ID,ID",
                   help="delete: tombstone these vector ids")
    p.add_argument("spec", help="index spec YAML (see cmd_ann_index docstring)")
    p.add_argument("--auto-compact", type=int, default=None, metavar="N",
                   help="re-cluster after N delta commits since last base")
    p.add_argument("--n-cells", type=int, default=None, metavar="K",
                   help="rebuild: re-shard at K cells (default: spec's)")
    p.add_argument("--iterations", type=int, default=None, metavar="I",
                   help="rebuild: Lloyd rounds (default: spec's; the "
                        "skew cure scales this with K)")
    p.add_argument("--init", default="modulo",
                   choices=["modulo", "sample"],
                   help="rebuild: k-means seeding — 'sample' (Forgy "
                        "spread) cures a collapsed quantizer")
    p.add_argument("--max-mean-occupancy", type=float, default=2048.0,
                   help="health: flag when mean live vectors per cell "
                        "exceeds this (frozen n_cells fattens with the "
                        "corpus — per-query probe cost grows even at "
                        "fixed nprobe)")
    p.add_argument("--max-balance", type=float, default=8.0,
                   help="health: flag when max/mean cell occupancy "
                        "exceeds this while max is above the occupancy "
                        "threshold (a skewed quantizer's catch-all cell)")
    p.add_argument("--queries", type=int, default=25, metavar="Q",
                   help="recall: sample size of stored vectors to query")
    p.set_defaults(fn=cmd_ann_index)

    p = sub.add_parser("embdedup-index",
                       help="incremental embedding near-dup (SemDeDup) "
                            "index")
    p.add_argument("action",
                   choices=["sync", "compact", "rebuild", "pairs",
                            "delete", "health"])
    p.add_argument("spec",
                   help="index spec YAML (kind: embdedup — see "
                        "cmd_embdedup_index docstring)")
    p.add_argument("--ids", default=None, metavar="ID,ID",
                   help="delete: tombstone these ids; pairs: bound the "
                        "read to these canonical smaller members")
    p.add_argument("--auto-compact", type=int, default=None, metavar="N",
                   help="re-cluster after N delta commits since last base")
    p.add_argument("--n-cells", type=int, default=None, metavar="K",
                   help="rebuild: re-block at K cells (default: spec's)")
    p.add_argument("--upsert", action="store_true",
                   help="sync: one-call CDC — delta ids tombstone their "
                        "previous versions in the same commit")
    p.add_argument("--min-pair-recall", type=float, default=0.5,
                   help="health: flag when sampled blocking pair-recall "
                        "drops below this")
    p.add_argument("--max-mean-occupancy", type=float, default=2048.0,
                   help="health: flag when mean live vectors per cell "
                        "exceeds this (frozen n_cells fattens with the "
                        "corpus; the cure is rebuild --n-cells ~sqrt(N))")
    p.add_argument("--max-balance", type=float, default=8.0,
                   help="health: flag when max/mean cell occupancy "
                        "exceeds this while max is above the occupancy "
                        "threshold (quantizer skew: a catch-all cell "
                        "absorbs every delta — more cells will NOT cure "
                        "it; the verdict recommends init='sample' + "
                        "scaled iterations)")
    p.add_argument("--iterations", type=int, default=None, metavar="I",
                   help="rebuild: Lloyd rounds (default: spec's; the "
                        "skew cure scales this with K)")
    p.add_argument("--init", default="modulo",
                   choices=["modulo", "sample"],
                   help="rebuild: k-means seeding — 'sample' (Forgy "
                        "spread) cures a collapsed quantizer")
    p.set_defaults(fn=cmd_embdedup_index)

    p = sub.add_parser("text-index", help="incremental BM25 text index")
    p.add_argument("action", choices=["sync", "compact", "search",
                                      "rebuild", "delete", "health"])
    p.add_argument("--max-terms-per-bucket", type=float, default=4096.0,
                   help="health: flag when a one-term search reads more "
                        "than this many terms' postings")
    p.add_argument("--prefix-len", type=int, default=None, metavar="P",
                   help="rebuild: re-bucket at 16^P buckets (in place)")
    p.add_argument("--ids", default=None, metavar="ID,ID",
                   help="delete: tombstone these doc ids")
    p.add_argument("spec", help="index spec YAML (see cmd_text_index docstring)")
    p.add_argument("--auto-compact", type=int, default=None, metavar="N",
                   help="re-cluster after N delta commits since last base")
    p.add_argument("--query", default=None, help="search: the query terms")
    p.add_argument("-k", type=int, default=10, help="search: top-k")
    p.set_defaults(fn=cmd_text_index)

    p = sub.add_parser("span-index",
                       help="incremental duplicated-span (ExactSubstr) index")
    p.add_argument("action", choices=["sync", "compact", "spans",
                                      "rebuild", "delete", "health"])
    p.add_argument("--max-coverage", type=float, default=0.5,
                   help="health: flag when the typical delta's projected "
                        "probe coverage exceeds this fraction")
    p.add_argument("spec", help="index spec YAML (see cmd_span_index docstring)")
    p.add_argument("--ids", default=None, metavar="ID,ID",
                   help="delete: tombstone these doc ids (retracts "
                        "surviving docs' un-duplicated spans too)")
    p.add_argument("--min-docs", type=int, default=None, metavar="M",
                   help="rebuild: re-derive hits under a new rule")
    p.add_argument("--prefix-len", type=int, default=None, metavar="P",
                   help="rebuild: re-bucket at 16^P buckets (in place)")
    p.add_argument("--auto-compact", type=int, default=None, metavar="N",
                   help="re-cluster after N delta commits since last base")
    p.add_argument("--docs", default=None, metavar="ID,ID",
                   help="spans: restrict to these doc ids (bounded read)")
    p.set_defaults(fn=cmd_span_index)

    p = sub.add_parser("retrieve",
                       help="hybrid BM25 + ANN retrieval (rank fusion), "
                            "or ANN-only with a single ann spec")
    p.add_argument("spec", nargs="+",
                   help="index spec YAML(s): a text spec + an ann spec "
                        "for hybrid fusion (either order — dispatched by "
                        "content), or a single ann spec for ANN-only "
                        "retrieval")
    p.add_argument("--query", default=None,
                   help="BM25 query terms (hybrid mode)")
    p.add_argument("--vec", default=None,
                   help="query vector as a JSON number array")
    p.add_argument("--vec-id", type=int, default=None,
                   help="query by a stored vector's id instead of --vec")
    p.add_argument("-k", type=int, default=10, help="fused top-k")
    p.add_argument("-n", type=int, default=20,
                   help="per-ranker top-N fed into the fusion")
    p.add_argument("--nprobe", type=int, default=2,
                   help="ANN cells probed")
    p.add_argument("--c", type=int, default=60,
                   help="RRF constant (1/(c + rank))")
    p.add_argument("--weights", default=None, metavar="LEX,SEM",
                   help="weighted RRF: per-ranker weights, e.g. 0.7,0.3")
    p.add_argument("--where", default=None, metavar="PRED",
                   help="metadata predicate filtering every leg — exact "
                        "for BM25, exact-within-probed-cells for ANN "
                        "(raise --nprobe under selective filters). When "
                        "ANY given index spec declares `attrs:` (text "
                        "first, then ann) it resolves from index-resident "
                        "attr rows over the attr NAMES (e.g. "
                        "\"lang = 'en'\") with no source scan; otherwise "
                        "it evaluates over the source pool's LATEST "
                        "version per id (e.g. \"value.lang = 'en'\")")
    p.add_argument("--explain", action="store_true",
                   help="print per-leg probe telemetry (# files read vs "
                        "live) after the results")
    p.set_defaults(fn=cmd_retrieve)

    p = sub.add_parser("types", help="pool named-type registry (types.json)")
    p.add_argument("pool")
    p.set_defaults(fn=cmd_types)

    p = sub.add_parser("log", help="pool commit history (DESCRIBE HISTORY)")
    p.add_argument("pool")
    p.set_defaults(fn=cmd_log)

    p = sub.add_parser("profile", help="per-column stats for a pool (SUMMARIZE)")
    p.add_argument("pool")
    p.add_argument("--columns", nargs="*", default=None,
                   help="restrict to these dotted leaf paths")
    p.add_argument("--where", default=None,
                   help="zed filter expression applied before profiling")
    p.add_argument("--approx", action="store_true",
                   help="HLL++ approximate distinct counts (the 100 TB path "
                        "for very-high-cardinality columns)")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("rollup", help="incremental materialized rollup")
    p.add_argument("action", choices=["sync", "view", "fold"])
    p.add_argument("spec", help="rollup spec YAML (see cmd_rollup docstring)")
    p.set_defaults(fn=cmd_rollup)

    p = sub.add_parser("dedup-index",
                       help="incremental MinHash-LSH dedup index")
    p.add_argument("action",
                   choices=["sync", "pairs", "index", "compact", "migrate",
                            "rebuild", "delete", "health"])
    p.add_argument("--max-coverage", type=float, default=0.5,
                   help="health: flag when the typical delta's projected "
                        "probe coverage exceeds this fraction")
    p.add_argument("spec",
                   help="index spec YAML (see cmd_dedup_index docstring)")
    p.add_argument("--prefix-len", type=int, default=None, metavar="P",
                   help="rebuild: re-bucket every key space at 16^P "
                        "buckets (in place, source-free)")
    p.add_argument("--auto-compact", type=int, default=None, metavar="N",
                   help="re-cluster after N delta commits since last base")
    p.add_argument("--ids", default=None, metavar="ID,ID,...",
                   help="pairs: bounded lookup by canonical smaller "
                        "member (reads only the colliding buckets)")
    p.set_defaults(fn=cmd_dedup_index)

    p = sub.add_parser("index-pool",
                       help="index-pool retention: masked-fraction health, "
                            "family-agnostic fold-compaction, vacuum")
    p.add_argument("action", choices=["health", "fold", "vacuum"])
    p.add_argument("pool")
    p.add_argument("--spec", action="append", default=None,
                   help="fold: index spec YAML(s) living in this pool "
                        "(repeatable; needed when a dedup index is a "
                        "tenant so the legacy self-heal knows prefix_len)")
    p.add_argument("--max-masked-fraction", type=float, default=0.2,
                   help="health: flag when more than this fraction of "
                        "rows are dead (tombstone-masked)")
    p.add_argument("--max-tombstones", type=int, default=100_000,
                   help="health: flag when more live tombstones than this "
                        "ride every masking read")
    p.add_argument("--target-rows", type=int, default=4_000_000,
                   help="fold: rows per output file")
    p.add_argument("--vacuum", action="store_true",
                   help="health: also report unreferenced_files older "
                        "than --retention")
    p.add_argument("--retention", type=float, default=3600.0,
                   help="vacuum: unreferenced dirs younger than this are "
                        "kept (in-flight concurrent writers). 0 = "
                        "single-writer immediate reclaim")
    p.set_defaults(fn=cmd_index_pool)

    p = sub.add_parser("compact", help="compact a pool's small commits")
    p.add_argument("pool")
    p.add_argument("--target-rows", type=int, default=4_000_000,
                   help="rows per output file")
    p.add_argument("--vacuum", action="store_true",
                   help="also delete the superseded data files")
    p.add_argument("--vacuum-retention", type=float, default=3600.0,
                   help="seconds; unreferenced dirs younger than this are "
                        "kept (in-flight concurrent writers). 0 = "
                        "single-writer immediate reclaim")
    p.add_argument("--keep-latest-by-key", action="store_true",
                   help="Kafka log-compaction semantics: keep only the "
                        "highest-offset data record per (topic, key)")
    p.add_argument("--cluster-by", nargs="*", default=None,
                   help="range-cluster files on these dotted columns and "
                        "record per-file min/max in the manifest "
                        "(scan(bounds=...) then skips whole files)")
    p.add_argument("--zorder", action="store_true",
                   help="with >= 2 --cluster-by columns: interleaved-bit "
                        "Morton layout so file skipping works on ANY "
                        "clustered column, not just the leading one")
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("info", help="kafka topic watermarks")
    p.add_argument("topics", nargs="+")
    p.add_argument("--config", default=None)
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
