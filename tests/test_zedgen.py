"""The `zync etl -zed` program generator (etl/zedgen.py): the YAML spec
compiles to the reference's EXACT program text (golden:
ztests/etl-zed.yaml, token-for-token), the CLI dumps it, and zedpipe RUNS
the generated text with the same results the DataFrame ETL compiler
produces — one spec, two engines, one answer."""

from __future__ import annotations

import re

import pytest

from zync_spark.etl.config import load_config
from zync_spark.etl.zedgen import generate_program
from zync_spark.zedpipe import compile_query

INVOICES_YAML = "/root/reference/demo/invoices.yaml"
ZTEST = "/root/reference/ztests/etl-zed.yaml"


def _reference_program() -> str:
    raw = open(ZTEST).read()
    start = raw.index("type done")
    ref = "\n".join(
        line[6:] if line.startswith("      ") else line
        for line in raw[start:].splitlines())
    return ref[:ref.index("| sort kafka.offset")
               + len("| sort kafka.offset")]


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def test_generated_program_matches_reference_golden():
    """Token-for-token equal to the reference compiler's output."""
    gen = generate_program(load_config(INVOICES_YAML))
    assert _norm(gen) == _norm(_reference_program())


def test_cli_etl_zed_dumps_program(capsys, tmp_path):
    from zync_spark.cli import main

    assert main(["--lake", str(tmp_path), "etl", INVOICES_YAML, "--zed"]) == 0
    out = capsys.readouterr().out
    assert _norm(out) == _norm(_reference_program())


def test_generated_program_runs_with_golden_rows(spark):
    """zedpipe executes the GENERATED text over the batch-1 CDC rows and
    produces the etl-demo ztest's documented NewInvoices records."""
    prog = generate_program(load_config(INVOICES_YAML))
    rows = [
        (("Invoices", 1), (100,), ("r", (100, "Alice", "taco", None, None), None)),
        (("Invoices", 2), (101,), ("r", (101, "Bob", "burrito", None, None), None)),
        (("InvoiceStatus", 1), (80,), ("r", (80, None, None, 101, "pending"), None)),
        (("InvoiceStatus", 2), (32,), ("r", (32, None, None, 100, "pending"), None)),
    ]
    schema = (
        "kafka struct<topic:string,offset:long>, key struct<ID:long>, "
        "value struct<op:string,"
        "after:struct<ID:long,customer:string,item:string,InvoiceID:long,status:string>,"
        "before:struct<ID:long,customer:string,item:string,InvoiceID:long,status:string>>")
    raw = spark.createDataFrame(rows, schema)
    staging = spark.createDataFrame(
        [], "kafka struct<topic:string,offset:long>, zed_type string")
    out = compile_query(prog, {"Raw": raw, "Staging": staging}).collect()
    data = sorted(
        (r["key"]["ID"], r["value"]["customer"], r["value"]["item"],
         r["value"]["invoice_status"])
        for r in out if r["key"] is not None)
    assert data == [
        (100, "Alice", "taco", "pending"),
        (101, "Bob", "burrito", "pending"),
    ]
    markers = [r for r in out if r["left"] is not None]
    assert len(markers) == 2


def test_generated_program_agrees_with_dataframe_compiler(spark, tmp_path):
    """One spec, two engines: the EtlPipeline (DataFrame compiler) commits
    its outputs to the Staging pool; the generated zed program run by
    zedpipe over the same Raw pool must produce the same data records
    (modulo the host-assigned consecutive output offsets and the marker
    encoding, both host-side concerns outside the program)."""
    import os

    from tests.fixtures_invoices import BATCHES, ROW_SCHEMA

    from zync_spark.etl import EtlPipeline, load_config as _lc
    from zync_spark.pool import Pool

    transform = _lc(INVOICES_YAML)
    raw = Pool.create(spark, os.path.join(str(tmp_path), "Raw"))
    staging = Pool.create(spark, os.path.join(str(tmp_path), "Staging"))
    raw.load(spark.createDataFrame(BATCHES[0], ROW_SCHEMA), "batch-1")

    # engine A: the DataFrame ETL compiler, committing to the pool
    EtlPipeline(spark, transform, {"Raw": raw, "Staging": staging}).run("b1")
    a = sorted(
        (r["key"]["ID"], r["value"]["ID"], r["value"]["customer"],
         r["value"]["item"], r["value"]["invoice_status"])
        for r in staging.scan().filter("zed_type = 'data'").collect())

    # engine B: the generated zed program over the same Raw scan (no
    # markers in Staging from B's perspective: pass the PRE-commit view)
    prog = generate_program(transform)
    empty_staging = spark.createDataFrame(
        [], "kafka struct<topic:string,offset:long>, zed_type string")
    out = compile_query(
        prog, {"Raw": raw.scan(), "Staging": empty_staging}).collect()
    b = sorted(
        (r["key"]["ID"], r["value"]["ID"], r["value"]["customer"],
         r["value"]["item"], r["value"]["invoice_status"])
        for r in out if r["key"] is not None)
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_four_batch_differential_generated_program_vs_compiler(spark, tmp_path):
    """The FULL etl-demo narrative (4 batches, create/read/update ops,
    incremental done-marker state) through both engines: before each
    EtlPipeline pass, the generated zed program is run by zedpipe over the
    same Raw scan + the CURRENT Staging marker state, and must predict
    exactly the records the compiler is about to commit."""
    import os
    from collections import Counter

    from tests.fixtures_invoices import BATCHES, ROW_SCHEMA

    from zync_spark.etl import EtlPipeline, load_config as _lc
    from zync_spark.pool import Pool

    transform = _lc(INVOICES_YAML)
    prog = generate_program(transform)
    raw = Pool.create(spark, os.path.join(str(tmp_path), "Raw"))
    staging = Pool.create(spark, os.path.join(str(tmp_path), "Staging"))
    empty_staging = spark.createDataFrame(
        [], "kafka struct<topic:string,offset:long>, zed_type string")

    def key5(r):
        return (r["key"]["ID"], r["value"]["ID"], r["value"]["customer"],
                r["value"]["item"], r["value"]["invoice_status"])

    seen: Counter = Counter()
    total_b = 0
    for i, batch in enumerate(BATCHES):
        raw.load(spark.createDataFrame(batch, ROW_SCHEMA), f"batch-{i+1}")

        st_df = staging.scan()
        tables = {"Raw": raw.scan(),
                  "Staging": st_df if st_df is not None else empty_staging}
        b_rows = Counter(
            key5(r) for r in compile_query(prog, tables).collect()
            if r["key"] is not None)
        total_b += sum(b_rows.values())

        EtlPipeline(spark, transform, {"Raw": raw, "Staging": staging}).run(
            f"pass-{i+1}")
        a_all = Counter(
            key5(r)
            for r in staging.scan().filter("zed_type = 'data'").collect())
        a_delta = a_all - seen
        seen = a_all
        assert b_rows == a_delta, f"batch {i+1}: {b_rows} != {a_delta}"
    # the narrative actually processed records in every pass
    assert total_b >= 6
