"""Dump `.explain("formatted")` for the headline queries (round-11
optimization evidence): writes plans/<tag>/<query>_<suffix>.txt for each
HEADLINE entry, on the stock sf layout. Usage:

    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

With no explicit query names the HEADLINE set is dumped; naming queries
dumps exactly those (the round-11 operator work touches non-headline
entries, whose before/after plans are committed the same way).

The session mirrors bench.py's sizing (shuffle partitions from corpus
bytes, AQE off) so the captured plans are the ones the bench actually
runs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.queries import HEADLINE, QUERIES
from zync_spark.session import get_spark


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    corpus_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    shuffle_parts = 8 if corpus_bytes < 32 << 20 else (
        16 if corpus_bytes < 96 << 20 else 32)
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    spark = get_spark("zync-spark-plans", shuffle_partitions=shuffle_parts,
                      adaptive=False)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[4:] or HEADLINE
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
