"""Experiment: the span index's per-pass probe vs its own saturation
honesty note (streaming/span_index.py): a delta contributes ~one window
hash per TOKEN, so with B buckets its expected bucket coverage is
1-(1-1/B)^tokens — prefix_len must be sized to the DELTA for the probe
to stay a small file subset of a growing index. This measures exactly
that: one large backfill (compacted into many clustered files), then a
stream of small deltas at two prefix_len settings, recording
probe_files vs live_files per pass and the spans_view(doc_ids=) read.

Expected: live_files grows with the corpus; probe_files tracks the
delta's token count over the bucket space (flat per delta size), and
the doc-bounded spans_view reads a handful of 'h:' files. Results go
to SCALING.md §12.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.pool import Pool
from zync_spark.queries import _scratch_dir
from zync_spark.session import get_spark
from zync_spark.streaming import span_index as SI

spark = get_spark("exp-spanidx", shuffle_partitions=8, adaptive=False)
spark.sparkContext.setLogLevel("ERROR")

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<doc_id:long,text:string>")
def _doc(i, tokens=40):
    # ~40 tokens/doc, all distinct across docs except planted repeats
    if i % 200 == 7 and i >= 200:  # verbatim repeat of a doc 200 earlier
        # the chain i -> i-200 -> ... collapses to its first link; the
        # old recursive spelling blew the stack at the 600k-doc decade
        i = i % 200
    return " ".join(f"w{i % 1009}x{j}y{i // 1009}" for j in range(tokens))


def run(prefix_len, backfill=6000, deltas=6, per=1, target_rows=300):
    spec = SI.SpanIndexSpec("x", "value.doc_id", "value.text",
                            window=8, min_docs=2, prefix_len=prefix_len)
    lake = _scratch_dir(f"zs-exp-spanidx{prefix_len}")
    shutil.rmtree(lake, ignore_errors=True)
    src = Pool.create(spark, f"{lake}/src")
    dest = Pool.create(spark, f"{lake}/idx")
    rows = [(("docs", 0, i), "data", (i, _doc(i))) for i in range(backfill)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    t0 = time.perf_counter()
    SI.sync_spans(src, dest, spec, ["docs"])
    print(f"prefix_len={prefix_len} backfill {backfill} docs "
          f"(~{backfill * 40} tokens): {time.perf_counter() - t0:.1f}s")
    SI.compact_spans(dest, target_rows=target_rows)
    print(f"{'pass':>4} {'docs':>6} {'live':>6} {'probe':>6} "
          f"{'cover%':>7} {'view':>5} {'sync_s':>7}")
    off = backfill
    for d in range(deltas):
        rows = [(("docs", 0, off + i), "data",
                 (off + i, _doc(7 if i == 0 else off + i)))
                for i in range(per)]
        new_ids = [off + i for i in range(per)]
        off += per
        src.load(spark.createDataFrame(rows, ROW), f"d{d}")
        stats = {}
        t0 = time.perf_counter()
        # no auto-compact here: the experiment wants live_files LARGE so
        # the flat-probe region is visible (probe_files is point lookups,
        # <= the delta's hash-bucket count regardless of index size;
        # production runs the cadence and lands below these numbers)
        SI.sync_spans(src, dest, spec, ["docs"], stats_out=stats)
        dt = time.perf_counter() - t0
        vstats = {}
        SI.spans_view(dest, spec, doc_ids=new_ids,
                      stats_out=vstats).count()
        live = stats.get("live_files", 0)
        probe = stats.get("probe_files", 0)
        print(f"{d:>4} {off:>6} {live:>6} {probe:>6} "
              f"{100 * probe / max(live, 1):>6.0f}% "
              f"{vstats.get('hit_files', 0):>5} {dt:>7.2f}")
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    # optional CLI override: BACKFILL [PLEN] — the round-6 gsf10-decade
    # run pushes the stored-index size 10x past the default
    if len(sys.argv) > 1:
        run(prefix_len=int(sys.argv[2]) if len(sys.argv) > 2 else 4,
            backfill=int(sys.argv[1]), target_rows=3000)
    else:
        for plen in (2, 4):
            run(prefix_len=plen)
