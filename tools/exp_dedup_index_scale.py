"""Experiment: does the incremental dedup index's per-pass read stay
bounded as the stored index grows?  (Round-4 fix: the r3 probe scanned
the WHOLE index every pass — the one per-pass cost that grew with corpus
size.)

Builds an index over synthetic documents in fixed-size deltas, compacting
on a small-files cadence, and records each pass's file-skipping telemetry
(probe_files / set_files vs live_files from sync_index stats_out).
Expected: live_files grows with the corpus; probe_files tracks the
DELTA's bucket fan-out (bands x docs prefixes, saturating at the bucket
count), not the corpus.  Results go to SCALING.md §"Dedup index".
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.pool import Pool
from zync_spark.queries import _scratch_dir
from zync_spark.session import get_spark
from zync_spark.streaming import dedup_index as DI

spark = get_spark("exp-dedupidx", shuffle_partitions=8, adaptive=False)
spark.sparkContext.setLogLevel("ERROR")

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<doc_id:long,text:string>")
SPEC = DI.DedupIndexSpec("x", "value.doc_id", "value.text",
                         k=3, num_hashes=64, bands=16, threshold=0.5)
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]


def _doc(i):
    # near-dup chain: doc i repeats the doc 250 earlier plus one more
    # " tail" per hop — spelled iteratively (the recursive form blew the
    # stack at the 600k-doc decade)
    hops = 0
    if i % 250 == 7 and i >= 250:
        hops, i = i // 250, i % 250
    base = " ".join(f"{w}{i % 997}x{j}{i // 997}" for j, w in enumerate(WORDS))
    return base + " tail" * hops


def main(backfill=2000, deltas=8, per=2, target_rows=400):
    """Realistic incremental shape: one large backfill (compacted into
    many clustered files), then a stream of SMALL deltas — each pass's
    probe should read only the delta's colliding buckets, a small and
    corpus-size-independent file subset."""
    lake = _scratch_dir("zs-exp-dedupidx")
    shutil.rmtree(lake, ignore_errors=True)
    src = Pool.create(spark, f"{lake}/src")
    dest = Pool.create(spark, f"{lake}/idx")
    rows = [(("docs", 0, i), "data", (i, _doc(i))) for i in range(backfill)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    t0 = time.perf_counter()
    DI.sync_index(src, dest, SPEC, ["docs"])
    print(f"backfill {backfill} docs: {time.perf_counter() - t0:.1f}s")
    DI.compact_index(dest, target_rows=target_rows, spec=SPEC)
    print(f"{'pass':>4} {'indexed':>8} {'live':>6} {'probe':>6} "
          f"{'set':>5} {'pairs':>6} {'sync_s':>7}")
    off = backfill
    for d in range(deltas):
        rows = [(("docs", 0, off + i), "data",
                 (off + i, _doc((off + i) % backfill) + (" tail" if i == 0
                                                         else " novel words")))
                for i in range(per)]
        off += per
        src.load(spark.createDataFrame(rows, ROW), f"d{d}")
        stats = {}
        t0 = time.perf_counter()
        # the RECOMMENDED maintenance mode: the auto-compact cadence
        # (round-5: plumbed through FromKafka too) re-clusters every few
        # delta commits, so the probe's file count stays flat. Round 5
        # also ckey-clusters each delta commit at load (8 range files),
        # which trades more OPEN calls between compactions for fewer
        # BYTES (a band probe skips fresh commits' sig/pair files) —
        # without the cadence, probe_files grows ~5/pass until the next
        # compaction instead of ~1 (measured; both bounded by it).
        DI.sync_index(src, dest, SPEC, ["docs"], stats_out=stats,
                      auto_compact_every=4)
        dt = time.perf_counter() - t0
        npairs = DI.pairs_view(dest, SPEC).count()
        print(f"{d:>4} {off:>8} {stats.get('live_files', 0):>6} "
              f"{stats.get('probe_files', 0):>6} "
              f"{stats.get('set_files', 0):>5} {npairs:>6} {dt:>7.2f}")
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    # optional CLI override: BACKFILL [DELTAS] — the round-6 gsf10-decade
    # run pushes the stored-index size 10-30x past the default
    if len(sys.argv) > 1:
        main(backfill=int(sys.argv[1]),
             deltas=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    else:
        main()
