"""Time the headline queries' ORACLE SQL in DuckDB at the bench scale —
the single-node comparison point for bench.py (same queries, same parquet
files, same result semantics). Prints one JSON line mirroring bench.py's
shape so the two are diffable:

    python tools/bench_duck.py            # sf0.1, min of 4 runs
    python bench.py

DuckDB here is the stand-in for "a very good single-node engine": staying
within ~2x of it at sf0.1 while every plan distributes cleanly (see
SCALING.md) is the local evidence the 100 TB story rests on.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zync_spark.queries import HEADLINE, ORACLE_SQL

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', 32)}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        sql = ORACLE_SQL.get(name)
        if sql is None:
            skipped.append(name)  # rows-only query: no SQL twin to time
            continue
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "skipped": skipped,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
