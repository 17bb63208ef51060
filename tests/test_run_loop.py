"""Live run-loop integration: the REAL Structured Streaming machinery
(writeStream.foreachBatch, availableNow trigger, checkpoint resume)
driven end-to-end over a broker-less FileQueue transport, then egress
back out with HWM resume — the full from-kafka → pool → to-kafka loop
(SURVEY §3.2/§3.3) without a Kafka broker."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from zync_spark.pool import Pool
from zync_spark.sources import connectjson
from zync_spark.sources.filequeue import FileQueue
from zync_spark.streaming.from_kafka import FromKafka
from zync_spark.streaming.to_kafka import ToKafka

S, Fld = StructType, StructField
KEY_T = S([Fld("ID", LongType())])
VAL_T = S([Fld("op", StringType()), Fld("name", StringType())])


def _records(spark, rows):
    """rows: (id, op, name) → [(key_bytes, value_bytes)] in Connect-JSON."""
    typed = spark.createDataFrame(
        [((k,), (op, nm)) for k, op, nm in rows],
        S([Fld("key", KEY_T), Fld("value", VAL_T)]),
    )
    enc = typed.select(
        connectjson.encode(F.col("key"), KEY_T).cast("binary").alias("k"),
        connectjson.encode(F.col("value"), VAL_T).cast("binary").alias("v"),
    )
    return [(r["k"], r["v"]) for r in enc.collect()]


def test_stream_run_loop_ingest_resume_egress(spark, tmp_path):
    queue = FileQueue(str(tmp_path / "q"))
    ckpt = str(tmp_path / "ckpt")
    pool = Pool.create(spark, str(tmp_path / "T"))
    fk = FromKafka(spark, {"T": pool}, KEY_T, VAL_T, format="json")

    queue.produce("T", _records(spark, [(i, "c", f"n{i}") for i in range(5)]))
    q = fk.run(frame=queue.stream_frame(spark), checkpoint=ckpt, exit_after=True)
    q.awaitTermination(120)
    assert fk.resume_offsets() == {"T": 5}
    assert len(pool.commits()) == 1

    # restart with the same checkpoint: only the NEW file is processed
    queue.produce("T", _records(spark, [(i, "u", f"m{i}") for i in (1, 3, 5)]))
    q = fk.run(frame=queue.stream_frame(spark), checkpoint=ckpt, exit_after=True)
    q.awaitTermination(120)
    assert fk.resume_offsets() == {"T": 8}
    assert len(pool.commits()) == 2

    rows = (
        pool.scan()
        .select("kafka.offset", "key.ID", "value.op", "value.name")
        .orderBy("offset")
        .collect()
    )
    assert [tuple(r) for r in rows[:2]] == [(0, 0, "c", "n0"), (1, 1, "c", "n1")]
    assert [tuple(r) for r in rows[5:]] == [
        (5, 1, "u", "m1"), (6, 3, "u", "m3"), (7, 5, "u", "m5"),
    ]

    # egress: pool → mirror queue, paged, resuming from the mirror's HWM
    mirror = FileQueue(str(tmp_path / "mirror"))
    tk = ToKafka(pool, KEY_T, VAL_T, format="json", batch_size=3)
    produced = tk.sync("T", mirror.end_offset("T"), mirror.produce_frame)
    assert produced == 8
    assert mirror.end_offset("T") == 8
    # idempotent: HWM says everything is already out
    assert tk.sync("T", mirror.end_offset("T"), mirror.produce_frame) == 0

    # wire fidelity through the whole loop
    back = connectjson.decode_df(
        mirror.batch_frame(spark, "T").withColumn(
            "value", F.col("value").cast("string")
        ),
        "value",
        VAL_T,
    )
    names = [r["name"] for r in back.select("value.name").orderBy("offset").collect()]
    assert names == [f"n{i}" for i in range(5)] + ["m1", "m3", "m5"]


def test_stream_run_loop_auto_compaction(spark, tmp_path):
    """Auto-compaction inside the live streaming loop: every 2 delta
    commits the pool folds into a base manifest; data and resume state
    are unaffected."""
    queue = FileQueue(str(tmp_path / "q"))
    ckpt = str(tmp_path / "ckpt")
    pool = Pool.create(spark, str(tmp_path / "T"))
    fk = FromKafka(spark, {"T": pool}, KEY_T, VAL_T, format="json",
                   auto_compact_every=2)

    offset = 0
    for batch in range(4):
        queue.produce(
            "T", _records(spark, [(offset + i, "c", f"n{offset+i}") for i in range(3)])
        )
        offset += 3
        q = fk.run(frame=queue.stream_frame(spark), checkpoint=ckpt,
                   exit_after=True)
        q.awaitTermination(120)

    # 4 delta commits → at least one base fold happened and at most one
    # delta is pending on top of the last base
    assert pool.commits_since_base() <= 1
    assert any("auto-compact" in m for m in (
        __import__("json").load(open(f"{pool._commit_dir()}/{c}"))["message"]
        for c in pool.commits()
    ))
    assert fk.resume_offsets() == {"T": 12}
    rows = pool.scan().select("key.ID").orderBy("ID").collect()
    assert [r["ID"] for r in rows] == list(range(12))


def test_stream_run_loop_live_rollup(spark, tmp_path):
    """Streaming materialized view: a rollup spec attached to the ingest
    loop stays in sync with the pool after every micro-batch — and equals
    the one-shot aggregate over everything ingested."""
    from zync_spark.streaming import incremental as inc

    queue = FileQueue(str(tmp_path / "q"))
    ckpt = str(tmp_path / "ckpt")
    pool = Pool.create(spark, str(tmp_path / "T"))
    summary = Pool.create(spark, str(tmp_path / "S"))
    spec = inc.RollupSpec(
        "ops", keys={"op": "value.op"}, aggs=[("n", "count", None)]
    )
    fk = FromKafka(spark, {"T": pool}, KEY_T, VAL_T, format="json",
                   rollups=[(spec, summary, ["T"])])

    ops = ["c", "u", "c", "d", "u", "c"]
    offset = 0
    for batch in (ops[:3], ops[3:]):
        queue.produce(
            "T",
            _records(spark, [(offset + i, op, f"n{offset+i}")
                             for i, op in enumerate(batch)]),
        )
        offset += len(batch)
        q = fk.run(frame=queue.stream_frame(spark), checkpoint=ckpt,
                   exit_after=True)
        q.awaitTermination(120)
        got = {r["op"]: r["n"] for r in inc.view(summary, spec).collect()}
        want = {}
        for op in ops[:offset]:
            want[op] = want.get(op, 0) + 1
        assert got == want
    # the view is cursor-consistent with the pool: one more sync is a no-op
    assert inc.sync(pool, summary, spec, ["T"]) == 0
