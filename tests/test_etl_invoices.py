"""Golden end-to-end CDC test: the reference's 4-batch invoices demo
(ztests/etl-demo.yaml) run through the Spark ETL compiler.

Asserts, after every batch: exact data rows (stable consecutive 0-based
NewInvoices offsets), exact done-marker set, and that an immediate rerun
commits 0 records (idempotency via the anti-join backstop)."""

from __future__ import annotations

import os

import pytest

from tests.fixtures_invoices import (
    BATCHES,
    GOLDEN_DATA,
    GOLDEN_DONE,
    INVOICES_YAML,
    ROW_SCHEMA,
)

from zync_spark.etl import EtlPipeline, load_config
from zync_spark.pool import Pool


def _staging_state(staging: Pool):
    df = staging.scan()
    assert df is not None
    rows = df.collect()
    data = sorted(
        (
            r["kafka"]["offset"],
            r["key"]["ID"],
            r["value"]["ID"],
            r["value"]["customer"],
            r["value"]["item"],
            r["value"]["invoice_status"],
        )
        for r in rows
        if r["zed_type"] == "data"
    )
    done = sorted(
        (r["kafka"]["topic"], r["kafka"]["offset"])
        for r in rows
        if r["zed_type"] == "done"
    )
    return data, done


def test_invoices_four_batches(spark, tmp_path):
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    transform = load_config(INVOICES_YAML)
    pipeline = EtlPipeline(spark, transform, {"Raw": raw, "Staging": staging})

    expected_data: list = []
    expected_done: list = []
    for batch_no, batch in enumerate(BATCHES, start=1):
        raw.load(spark.createDataFrame(batch, ROW_SCHEMA), f"batch-{batch_no}")
        committed = pipeline.run(f"etl-{batch_no}")
        assert committed > 0, f"batch {batch_no} committed nothing"

        expected_data += GOLDEN_DATA[batch_no]
        expected_done += GOLDEN_DONE[batch_no]
        data, done = _staging_state(staging)
        assert data == sorted(expected_data), f"data mismatch after batch {batch_no}"
        assert done == sorted(expected_done), f"markers mismatch after batch {batch_no}"

        # Idempotent rerun: anti-join makes it a no-op (README.md:447-455).
        assert pipeline.run("rerun") == 0, f"rerun after batch {batch_no} not idempotent"


def test_unmatched_row_stays_pending(spark, tmp_path):
    """Dan's invoice (batch 2) has no InvoiceStatus partner yet: no output,
    no done marker — retried and resolved by batch 3 (README.md:465-476)."""
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    transform = load_config(INVOICES_YAML)
    pipeline = EtlPipeline(spark, transform, {"Raw": raw, "Staging": staging})

    raw.load(spark.createDataFrame(BATCHES[0] + BATCHES[1], ROW_SCHEMA))
    pipeline.run()
    data, done = _staging_state(staging)
    assert ("Invoices", 4) not in done
    assert not any(r[1] == 103 for r in data)

    raw.load(spark.createDataFrame(BATCHES[2], ROW_SCHEMA))
    pipeline.run()
    data, done = _staging_state(staging)
    assert ("Invoices", 4) in done
    assert any(r[1] == 103 and r[5] == "pending" for r in data)


def test_route_validation():
    from zync_spark.etl.config import ConfigError, load_config as lc

    bad = INVOICES_YAML.replace(
        "  - topic: InvoiceStatus\n    pool: Raw",
        "  - topic: InvoiceStatus\n    pool: Other",
    )
    # same topic in two pools is fine; duplicate topic with conflicting pool is not
    dup = INVOICES_YAML.replace(
        "inputs:\n  - topic: Invoices\n    pool: Raw",
        "inputs:\n  - topic: Invoices\n    pool: Raw\n  - topic: Invoices\n    pool: Other",
    )
    with pytest.raises(ConfigError):
        lc(dup)
    lc(bad)  # distinct pools for distinct topics is legal


MULTI_OUT_YAML = """
inputs:
  - topic: Invoices
    pool: Raw
  - topic: InvoiceStatus
    pool: Raw

outputs:
  - topic: NewInvoices
    pool: Staging
  - topic: StatusFeed
    pool: StatusPool

transforms:
  - type: stateless
    where: value.op in ["c", "r"]
    in: Invoices
    out: NewInvoices
    zed: |
      | out:={key: in.key, value: {ID: in.value.after.ID, customer: in.value.after.customer}}
  - type: stateless
    in: InvoiceStatus
    out: StatusFeed
    zed: |
      | out:={key: in.key, value: {ID: in.value.after.InvoiceID, status: in.value.after.status}}
"""


def test_multi_output_pools(spark, tmp_path):
    """Rules fan out to two output pools; each pool gets its own atomic
    commit, done markers, and offset sequence (one plan per pool — the
    reference's per-output-topic program loop, etl/build.go:66-80)."""
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    statusp = Pool.create(spark, os.path.join(tmp_path, "StatusPool"))
    transform = load_config(MULTI_OUT_YAML)
    pipeline = EtlPipeline(
        spark, transform, {"Raw": raw, "Staging": staging, "StatusPool": statusp}
    )

    raw.load(spark.createDataFrame(BATCHES[0] + BATCHES[1], ROW_SCHEMA))
    assert pipeline.run() > 0
    stg = staging.scan().collect()
    sts = statusp.scan().collect()
    # Staging sees only Invoices-derived rows + Invoices markers
    assert all(r["kafka"]["topic"] == "NewInvoices" for r in stg if r["zed_type"] == "data")
    assert {r["kafka"]["topic"] for r in stg if r["zed_type"] == "done"} == {"Invoices"}
    assert {r["kafka"]["topic"] for r in sts if r["zed_type"] == "done"} == {"InvoiceStatus"}
    # per-pool offset sequences both start at 0 and are consecutive
    stg_offsets = sorted(r["kafka"]["offset"] for r in stg if r["zed_type"] == "data")
    sts_offsets = sorted(r["kafka"]["offset"] for r in sts if r["zed_type"] == "data")
    assert stg_offsets == list(range(len(stg_offsets)))
    assert sts_offsets == list(range(len(sts_offsets)))
    # idempotent rerun across BOTH pools
    assert pipeline.run("rerun") == 0
    # incremental: new batch appends with continuing offsets
    raw.load(spark.createDataFrame(BATCHES[2], ROW_SCHEMA))
    assert pipeline.run() > 0
    sts2 = sorted(
        r["kafka"]["offset"] for r in statusp.scan().collect() if r["zed_type"] == "data"
    )
    assert sts2 == list(range(len(sts2)))
    assert pipeline.run("rerun-2") == 0


def test_split_input_pool_conflict():
    """One input topic feeding rules that land in different output pools is
    rejected — its done markers could not live in one place
    (etl/routes.go:62-70)."""
    from zync_spark.etl.config import ConfigError, load_config as lc

    bad = MULTI_OUT_YAML.replace("in: InvoiceStatus", "in: Invoices")
    with pytest.raises(ConfigError, match="multiple output pools"):
        lc(bad)


@pytest.mark.slow
def test_cursor_prunes_incremental_scans(spark, tmp_path):
    """After batches are fully processed, the next build's raw scan prunes
    fully-done commits at the MANIFEST level (etl/build.go:9-18's missing
    optimization) — and stays correct with gaps (pending rows hold the
    cursor back until resolved)."""
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    transform = load_config(INVOICES_YAML)
    pipeline = EtlPipeline(spark, transform, {"Raw": raw, "Staging": staging})

    raw.load(spark.createDataFrame(BATCHES[0], ROW_SCHEMA), "b1")
    pipeline.run()
    # batch 2 leaves Dan's invoice (offset 4) pending: cursor stuck at 4
    raw.load(spark.createDataFrame(BATCHES[1], ROW_SCHEMA), "b2")
    pipeline.run()
    cursors2 = staging.stored_cursors()
    assert cursors2["Invoices"] == 4

    # with batch-1 offsets all done, a bounded raw scan drops commit b1
    all_files = raw.committed_files()
    pruned = raw.committed_files(lower_bounds={"Invoices": cursors2["Invoices"]})
    assert set(pruned) <= set(all_files)

    # batch 3 resolves Dan; full golden state must still hold after pruned
    # incremental runs (correctness backstop = anti-join over the tail)
    raw.load(spark.createDataFrame(BATCHES[2], ROW_SCHEMA), "b3")
    pipeline.run()
    assert staging.stored_cursors()["Invoices"] > 4
    assert pipeline.run("rerun") == 0
    data, done = _staging_state(staging)
    expected_data = sorted(GOLDEN_DATA[1] + GOLDEN_DATA[2] + GOLDEN_DATA[3])
    expected_done = sorted(GOLDEN_DONE[1] + GOLDEN_DONE[2] + GOLDEN_DONE[3])
    assert data == expected_data and done == expected_done


def test_compiled_plan_shape(spark, tmp_path):
    """Golden compiled-plan test (analog of the reference's generated-
    program golden, ztests/etl-zed.yaml), in both cursor regimes:

    1. markers at/above the cursor → the physical plan carries the full
       signature: done-marker anti join, window offset assignment, rule-
       branch union, and the cursor bound pushed into the parquet scan;
    2. everything processed → the bounded marker scan prunes to NOTHING
       at the manifest level and the anti-join disappears from the plan
       entirely (the run the reference performs a full scan for
       compiles to a no-op here)."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    transform = load_config(INVOICES_YAML)
    pipeline = EtlPipeline(spark, transform, {"Raw": raw, "Staging": staging})
    raw.load(spark.createDataFrame(BATCHES[0], ROW_SCHEMA))
    # pre-seed a done marker with NO stored cursor: markers >= cursor(0)
    staging.load(
        spark.createDataFrame(
            [(("Invoices", 0, 1), "done")],
            "kafka struct<topic:string,partition:long,offset:long>, zed_type string",
        )
    )

    outputs, _markers = pipeline.build()
    assert outputs is not None
    plan = outputs._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan                       # done-marker anti join
    assert "row_number" in plan                     # offset assignment window
    assert "Union" in plan                          # switch-branch merge
    assert "GreaterThanOrEqual(kafka.offset,0)" in plan  # cursor bound pushed

    # regime 2: process everything; next build prunes the anti-join away
    pipeline.run()
    outputs2, _ = pipeline.build()
    if outputs2 is not None:
        plan2 = outputs2._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" not in plan2


def _repartition(batch, parts=2):
    """Shard a demo batch across `parts` partitions by key id, with each
    partition getting its own offset sequence STARTING AT THE ORIGINAL
    OFFSET NUMBERS — so sibling partitions deliberately reuse offset
    numbers (Kafka's model: offsets are per-partition sequences), the
    exact collision the round-5 pipeline refused."""
    return [((t, key[0] % parts, o), key, value, zt)
            for (t, _p, o), key, value, zt in batch]


def _values_state(staging):
    df = staging.scan()
    rows = df.collect()
    data = sorted(
        ((r["value"]["ID"], r["value"]["customer"], r["value"]["item"],
          r["value"]["invoice_status"])
         for r in rows if r["zed_type"] == "data"),
        key=repr,  # stateless status rows carry null customer/item
    )
    done = sorted(
        (r["kafka"]["topic"], r["kafka"]["partition"], r["kafka"]["offset"])
        for r in rows if r["zed_type"] == "done"
    )
    return data, done


@pytest.mark.slow
def test_multipartition_cdc_end_to_end(spark, tmp_path):
    """Round 6: multi-partition CDC input is SUPPORTED — markers, the
    anti-join, cursors, and output offsets all key per (topic,
    partition), so colliding offset numbers across sibling partitions
    (Kafka's normal state) process exactly once each. Value-level output
    must match the single-partition golden run; per-partition output
    offsets are consecutive from 0 with no cross-partition collisions;
    reruns are no-ops."""
    # reference run: the stock single-partition demo
    raw1 = Pool.create(spark, os.path.join(tmp_path, "Raw1"))
    st1 = Pool.create(spark, os.path.join(tmp_path, "St1"))
    p1 = EtlPipeline(spark, load_config(INVOICES_YAML),
                     {"Raw": raw1, "Staging": st1})
    # multi-partition run: same events sharded by id parity, offsets
    # colliding across partitions
    raw2 = Pool.create(spark, os.path.join(tmp_path, "Raw2"))
    st2 = Pool.create(spark, os.path.join(tmp_path, "St2"))
    p2 = EtlPipeline(spark, load_config(INVOICES_YAML),
                     {"Raw": raw2, "Staging": st2})

    for batch_no, batch in enumerate(BATCHES, start=1):
        raw1.load(spark.createDataFrame(batch, ROW_SCHEMA), f"b{batch_no}")
        p1.run(f"etl-{batch_no}")
        raw2.load(spark.createDataFrame(_repartition(batch), ROW_SCHEMA),
                  f"b{batch_no}")
        p2.run(f"etl-{batch_no}")
        assert p2.run("rerun") == 0  # per-partition markers: idempotent

    want_vals, _ = _values_state(st1)
    got_vals, got_done = _values_state(st2)
    assert got_vals == want_vals  # value-level parity with the golden

    # done markers carry the SOURCE partition: both partitions present,
    # and the marker set is exactly the consumed (t, p, o) triples
    assert {p for _t, p, _o in got_done} == {0, 1}

    # output offsets: per (topic, partition) consecutive from 0, never
    # colliding across partitions of one topic
    outs = [
        (r["kafka"]["topic"], r["kafka"]["partition"], r["kafka"]["offset"])
        for r in st2.scan().collect() if r["zed_type"] == "data"
    ]
    assert len(outs) == len(set(outs))
    per_part: dict = {}
    for t, p, o in outs:
        per_part.setdefault((t, p), []).append(o)
    for (t, p), offs in per_part.items():
        assert sorted(offs) == list(range(len(offs))), (t, p, offs)


@pytest.mark.slow
def test_multipartition_cursors_pend_independently(spark, tmp_path):
    """A pending row holds back ONLY its own partition's cursor; stored
    cursors carry per-partition keys plus the topic-level floor (min) for
    manifest pruning and pre-round-6 readers."""
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    pipeline = EtlPipeline(spark, load_config(INVOICES_YAML),
                           {"Raw": raw, "Staging": staging})
    # batches 1+2 sharded: Dan (id 103, partition 1) stays pending —
    # his InvoiceStatus partner only arrives in batch 3
    raw.load(spark.createDataFrame(
        _repartition(BATCHES[0] + BATCHES[1]), ROW_SCHEMA), "b12")
    pipeline.run()
    cur = staging.stored_cursors()
    # partition 1 of Invoices is stuck at Dan's offset (4); partition 0
    # (Charlie, id 102 -> offset 3) completed and advanced past it
    assert cur["Invoices#1"] == 4
    assert cur["Invoices#0"] == 4  # max scanned (3) + 1
    assert cur["Invoices"] == min(cur["Invoices#0"], cur["Invoices#1"])
    # batch 3 resolves Dan; partition-1 cursor advances
    raw.load(spark.createDataFrame(_repartition(BATCHES[2]), ROW_SCHEMA),
             "b3")
    pipeline.run()
    cur2 = staging.stored_cursors()
    assert cur2["Invoices#1"] > 4
    assert pipeline.run("rerun") == 0


def test_concurrent_etl_commit_aborts(spark, tmp_path, monkeypatch):
    # run() is read-modify-write on the output pool (markers, producer
    # offsets, cursors): an interleaved commit must abort the pass, not
    # let it land with stale reads (duplicate offsets / double process)
    from zync_spark.pool import ConcurrentWriteError

    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    pipeline = EtlPipeline(
        spark, load_config(INVOICES_YAML), {"Raw": raw, "Staging": staging}
    )
    raw.load(spark.createDataFrame(BATCHES[0], ROW_SCHEMA), "b1")

    real_load = Pool.load
    raced = {"done": False}

    def interleaved(self, df, message="", cursors=None, occ_token=None):
        if occ_token is not None and not raced["done"]:
            raced["done"] = True
            # a competing writer lands a commit on the output pool first
            real_load(self, df.limit(1), "racer")
        return real_load(self, df, message, cursors=cursors, occ_token=occ_token)

    monkeypatch.setattr(Pool, "load", interleaved)
    with pytest.raises(ConcurrentWriteError):
        pipeline.run("etl")
    monkeypatch.setattr(Pool, "load", real_load)
    # rerun from the advanced state completes normally
    assert pipeline.run("etl-retry") > 0


@pytest.mark.slow
def test_late_appearing_partition_zero_not_skipped(spark, tmp_path):
    """Round-6 review regression: the topic-level floor cursor must not
    be read back as partition 0's bound — producers that start on
    partitions 1/2 and only LATER write partition 0 must still have
    p0's early offsets scanned and processed (a phantom p0 cursor would
    skip them silently forever)."""
    raw = Pool.create(spark, os.path.join(tmp_path, "Raw"))
    staging = Pool.create(spark, os.path.join(tmp_path, "Staging"))
    pipeline = EtlPipeline(spark, load_config(INVOICES_YAML),
                           {"Raw": raw, "Staging": staging})

    def on_part(rows, part):
        return [((t, part, o), k, v, z) for (t, _p, o), k, v, z in rows]

    # batches 1+2 land ONLY on partitions 1 and 2 (high offsets)
    b12 = on_part(BATCHES[0], 1) + on_part(BATCHES[1], 2)
    raw.load(spark.createDataFrame(b12, ROW_SCHEMA), "b12")
    pipeline.run()
    cur = staging.stored_cursors()
    assert "Invoices#1" in cur and "Invoices" in cur
    # NOW partition 0 appears, with offsets BELOW the stored floor —
    # batch 3's status updates resolve Dan; they must be scanned
    b3 = on_part(BATCHES[2], 0)
    raw.load(spark.createDataFrame(b3, ROW_SCHEMA), "b3")
    n = pipeline.run()
    assert n > 0, "late partition-0 rows were silently skipped"
    done = [
        (r["kafka"]["topic"], r["kafka"]["partition"], r["kafka"]["offset"])
        for r in staging.scan().collect() if r["zed_type"] == "done"
    ]
    assert ("InvoiceStatus", 0, 4) in done  # Dan's resolver, p0 offset 4
    assert pipeline.run("rerun") == 0
