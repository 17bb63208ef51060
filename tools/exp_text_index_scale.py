"""Experiment: does the BM25 text index's per-QUERY read stay bounded
as the stored index grows?

Builds the index over synthetic documents in fixed-size deltas with the
recommended auto-compact cadence, and records each round's search
telemetry (probe_files / dlen_files vs live_files from search_text
stats_out) for a fixed 2-term query. Expected: live_files follows the
compaction sawtooth; probe_files tracks the QUERY's bucket count (2
term buckets + the matching docs' dlen buckets), not the corpus.
Results go to SCALING.md's text-index note.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.pool import Pool
from zync_spark.queries import _scratch_dir
from zync_spark.session import get_spark
from zync_spark.streaming import text_index as TI

spark = get_spark("exp-textidx", shuffle_partitions=8, adaptive=False)
spark.sparkContext.setLogLevel("ERROR")

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<doc_id:long,text:string>")
SPEC = TI.TextIndexSpec("x", "value.doc_id", "value.text")
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]


def _doc(i):
    n = 8 + (i * 11) % 40
    return " ".join(WORDS[(i * 7 + j * 3) % len(WORDS)] + str((i + j) % 97)
                    for j in range(n)) + (" alpha0 bravo1" if i % 3 else "")


def main(backfill=3000, deltas=8, per=200):
    lake = _scratch_dir("zs-exp-textidx")
    shutil.rmtree(lake, ignore_errors=True)
    src = Pool.create(spark, f"{lake}/src")
    dest = Pool.create(spark, f"{lake}/idx")
    rows = [(("docs", 0, i), "data", (i, _doc(i))) for i in range(backfill)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    t0 = time.perf_counter()
    TI.sync_text(src, dest, SPEC, ["docs"])
    print(f"backfill {backfill} docs: {time.perf_counter() - t0:.1f}s")
    TI.compact_text(dest, target_rows=2000)
    print(f"{'pass':>4} {'indexed':>8} {'live':>6} {'probe':>6} "
          f"{'dlen':>5} {'hits':>5} {'q_s':>6}")
    off = backfill
    for d in range(deltas):
        rows = [(("docs", 0, off + i), "data", (off + i, _doc(off + i)))
                for i in range(per)]
        off += per
        src.load(spark.createDataFrame(rows, ROW), f"d{d}")
        TI.sync_text(src, dest, SPEC, ["docs"], auto_compact_every=4)
        stats: dict = {}
        t0 = time.perf_counter()
        hits = TI.search_text(dest, SPEC, "alpha0 bravo1", k=10,
                              stats_out=stats).count()
        dt = time.perf_counter() - t0
        print(f"{d:>4} {off:>8} {stats.get('live_files', 0):>6} "
              f"{stats.get('probe_files', 0):>6} "
              f"{stats.get('dlen_files', 0):>5} {hits:>5} {dt:>6.2f}")
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    # optional CLI override: BACKFILL [DELTAS] — the round-6 gsf10-decade
    # run pushes the stored-index size 10-30x past the default
    if len(sys.argv) > 1:
        main(backfill=int(sys.argv[1]),
             deltas=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    else:
        main()
