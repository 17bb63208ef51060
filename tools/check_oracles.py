"""Local stand-in for the driver's CORRECTNESS gate: run every catalog query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row counts + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"f:{float(v)!r}"
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__[:1]}:{v}"


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from zync_spark.queries import ORACLE_SQL, QUERIES
    from zync_spark.session import get_spark

    # progress \r-spam swallows PASS lines in piped captures (this
    # file's own docstring warns about it) — same cure as bench.py.
    # Vanilla mode stays truly vanilla: the driver's own session has
    # progress bars too, and confs don't change results, only logs.
    os.environ["SPARK_GRAFT_NO_PROGRESS"] = "1"
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Driver-mimic mode: the external gate builds its OWN SparkSession
        # with none of our confs (no UTC tz, no AQE tuning). Catching a
        # query that only passes under get_spark() is the whole point.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[16]").appName(
            "oracle-check-vanilla"
        ).config("spark.ui.showConsoleProgress", "false").getOrCreate()
    else:
        spark = get_spark("oracle-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in ORACLE_SQL:
            print(f"ok?  {name}: no oracle (rows-only) — {len(srows)} rows")
            continue
        try:
            rel = con.sql(ORACLE_SQL[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sset, dset = rowset([c.lower() for c in scols], srows), rowset(dcols, drows)
        if sorted(c.lower() for c in scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
        elif sset != dset:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            print(f"PASS {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
