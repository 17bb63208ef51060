"""Regenerate golden oracle files (currently: tests/golden/etl_invoices.parquet).

The etl_invoices catalog entry runs the reference's 4-batch CDC demo
(ztests/etl-demo.yaml) against fixed fixtures, so its final Staging state
is deterministic; the golden parquet lets the correctness gate hash-check
it like any SQL-expressible query. Re-run this after any intentional
change to the ETL semantics and commit the new golden.

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "etl_invoices.parquet",
)

SCHEMA = pa.schema(
    [
        ("topic", pa.string()),
        ("offset", pa.int64()),
        ("zed_type", pa.string()),
        ("key_id", pa.int64()),
        ("value_id", pa.int64()),
        ("customer", pa.string()),
        ("item", pa.string()),
        ("invoice_status", pa.string()),
    ]
)


def main() -> None:
    from pyspark.sql import SparkSession

    from zync_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("regen-goldens")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES["etl_invoices"](spark, "/root/testdata/sf0.001")
    rows = sorted(map(tuple, df.collect()))
    cols = list(zip(*rows))
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, SCHEMA)], schema=SCHEMA
    )
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pq.write_table(table, GOLDEN)
    print(f"wrote {len(rows)} rows to {GOLDEN}")


if __name__ == "__main__":
    main()
