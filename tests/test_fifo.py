"""from-kafka / to-kafka pipeline logic, driven with broker-less frames
(the kafka source/sink are injected seams; everything below them is plain
DataFrames)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from zync_spark.pool import Pool
from zync_spark.sources.avro import encode_column
from zync_spark.sources.registry import MemoryRegistry
from zync_spark.streaming.from_kafka import FromKafka, apply_shaper
from zync_spark.streaming.to_kafka import ToKafka

S, Fld = StructType, StructField

KEY_T = S([Fld("ID", LongType())])
VAL_T = S([Fld("op", StringType()), Fld("name", StringType())])

FRAME_T = S(
    [
        Fld("topic", StringType()),
        Fld("partition", LongType()),
        Fld("offset", LongType()),
        Fld("key", BinaryType()),
        Fld("value", BinaryType()),
    ]
)


def _wire_frame(spark, reg, rows):
    """rows: (topic, offset, key_id, op, name) → avro-framed kafka frame."""
    typed = spark.createDataFrame(
        [(t, 0, o, (k,), (op, nm)) for t, o, k, op, nm in rows],
        S(
            [
                Fld("topic", StringType()),
                Fld("partition", LongType()),
                Fld("offset", LongType()),
                Fld("key", KEY_T),
                Fld("value", VAL_T),
            ]
        ),
    )
    wire = encode_column(typed, "key", KEY_T, reg)
    return encode_column(wire, "value", VAL_T, reg)


def test_from_kafka_ingest_and_resume(spark, tmp_path):
    reg = MemoryRegistry()
    pool = Pool.create(spark, str(tmp_path / "T"))
    fk = FromKafka(spark, {"T": pool}, KEY_T, VAL_T, registry=reg, format="avro")

    assert fk.resume_offsets() == {"T": 0}
    frame = _wire_frame(spark, reg, [("T", 0, 1, "c", "a"), ("T", 1, 2, "c", "b")])
    committed = fk.commit_batch(frame)
    assert committed == {"T": 2}
    assert fk.resume_offsets() == {"T": 2}

    env = pool.scan().orderBy(F.col("kafka.offset")).collect()
    assert env[0]["kafka"]["topic"] == "T" and env[0]["kafka"]["offset"] == 0
    assert env[0]["key"]["ID"] == 1 and env[0]["value"]["name"] == "a"
    assert env[0]["zed_type"] == "data"

    # redelivery below the resume offset (checkpoint replay after a
    # partial commit) → duplicates filtered, replay is a no-op
    assert fk.commit_batch(_wire_frame(spark, reg, [("T", 1, 2, "c", "b")])) == {}
    assert pool.scan().count() == 2  # nothing double-committed

    # a replayed batch MIXING old and new rows commits only the new ones
    committed = fk.commit_batch(
        _wire_frame(spark, reg, [("T", 1, 2, "c", "b"), ("T", 2, 3, "u", "c")])
    )
    assert committed == {"T": 1}
    assert fk.resume_offsets() == {"T": 3}


def test_from_kafka_connectjson_format(spark, tmp_path):
    from zync_spark.sources import connectjson

    pool = Pool.create(spark, str(tmp_path / "J"))
    typed = spark.createDataFrame(
        [("J", 0, 0, (7,), ("c", "x"))],
        S(
            [
                Fld("topic", StringType()),
                Fld("partition", LongType()),
                Fld("offset", LongType()),
                Fld("key", KEY_T),
                Fld("value", VAL_T),
            ]
        ),
    )
    frame = typed.withColumn(
        "key", connectjson.encode(F.col("key"), KEY_T).cast("binary")
    ).withColumn("value", connectjson.encode(F.col("value"), VAL_T).cast("binary"))
    fk = FromKafka(spark, {"J": pool}, KEY_T, VAL_T, format="json")
    assert fk.commit_batch(frame) == {"J": 1}
    row = pool.scan().collect()[0]
    assert row["key"]["ID"] == 7 and row["value"]["op"] == "c"


def test_shaper_assignment_and_filter(spark):
    env = spark.createDataFrame(
        [(("T", 0, 0), "x"), (("T", 0, 1), "y")],
        S(
            [
                Fld(
                    "kafka",
                    S(
                        [
                            Fld("topic", StringType()),
                            Fld("partition", LongType()),
                            Fld("offset", LongType()),
                        ]
                    ),
                ),
                Fld("v", StringType()),
            ]
        ),
    )
    shaped = apply_shaper(env, '| v := to_upper(v)')
    assert sorted(r["v"] for r in shaped.collect()) == ["X", "Y"]
    # nested assignment via withField
    shaped2 = apply_shaper(env, '| kafka.topic := "Renamed"')
    assert {r["kafka"]["topic"] for r in shaped2.collect()} == {"Renamed"}
    # bare predicate = filter
    filtered = apply_shaper(env, 'kafka.offset >= 1')
    assert [r["kafka"]["offset"] for r in filtered.collect()] == [1]


def test_to_kafka_paged_sync(spark, tmp_path):
    reg = MemoryRegistry()
    pool = Pool.create(spark, str(tmp_path / "Out"))
    rows = [
        (("T", 0, i), (i,), ("c", f"r{i}"), "data") for i in range(7)
    ]
    env_schema = S(
        [
            Fld("kafka", S([Fld("topic", StringType()), Fld("partition", LongType()), Fld("offset", LongType())])),
            Fld("key", KEY_T),
            Fld("value", VAL_T),
            Fld("zed_type", StringType()),
        ]
    )
    pool.load(spark.createDataFrame(rows, env_schema))

    pages = []
    tk = ToKafka(pool, KEY_T, VAL_T, registry=reg, format="avro", batch_size=3)
    produced = tk.sync("T", hwm=2, produce=lambda df: pages.append(df.collect()))
    assert produced == 5                      # offsets 2..6
    assert [len(p) for p in pages] == [3, 2]  # paged by batch_size
    # frames carry confluent-framed bytes in offset order
    first = pages[0][0]
    assert first["offset"] == 2 and first["value"][0] == 0


def test_to_kafka_bulk_sync(spark, tmp_path):
    """Offset-range bulk pages: same records/order/cursor semantics as the
    row-count pager, one produce per span, gap-safe (offsets 0..6 with a
    hole at 4, span 3 → pages [0,3) [3,6) [6,9))."""
    pool = Pool.create(spark, str(tmp_path / "Bulk"))
    rows = [
        (("T", 0, i), (i,), ("c", f"r{i}"), "data") for i in range(7) if i != 4
    ]
    env_schema = S(
        [
            Fld("kafka", S([Fld("topic", StringType()), Fld("partition", LongType()), Fld("offset", LongType())])),
            Fld("key", KEY_T),
            Fld("value", VAL_T),
            Fld("zed_type", StringType()),
        ]
    )
    pool.load(spark.createDataFrame(rows, env_schema))

    pages = []
    tk = ToKafka(pool, KEY_T, VAL_T, format="json")
    produced = tk.sync_bulk(
        "T", hwm=1, produce=lambda df: pages.append(df.collect()), page_span=3
    )
    assert produced == 5                      # offsets 1,2,3,5,6
    assert [[r["offset"] for r in p] for p in pages] == [[1, 2, 3], [5, 6]]
    # records match what the row-count pager produces for the same hwm
    rowpages = []
    tk2 = ToKafka(pool, KEY_T, VAL_T, format="json", batch_size=2)
    assert tk2.sync("T", hwm=1, produce=lambda df: rowpages.append(df.collect())) == 5
    flat = [r["offset"] for p in rowpages for r in p]
    assert flat == [r["offset"] for p in pages for r in p]
    # empty pool / fully-synced short-circuit
    assert tk.sync_bulk("T", hwm=100, produce=lambda df: None) == 0


def test_to_kafka_sync_partitions(spark, tmp_path):
    """Per-partition egress: each partition resumes at its own HWM, pages
    carry only that partition's offset sequence, and the legacy
    single-partition pager still errors loudly on mixed pools."""
    pool = Pool.create(spark, str(tmp_path / "Multi"))
    rows = [
        (("T", p, o), (o,), ("c", f"p{p}o{o}"), "data")
        for p in (0, 1) for o in range(4)
    ]
    env_schema = S(
        [
            Fld("kafka", S([Fld("topic", StringType()), Fld("partition", LongType()), Fld("offset", LongType())])),
            Fld("key", KEY_T),
            Fld("value", VAL_T),
            Fld("zed_type", StringType()),
        ]
    )
    pool.load(spark.createDataFrame(rows, env_schema))

    tk = ToKafka(pool, KEY_T, VAL_T, format="json", batch_size=3)
    # legacy strict mode refuses the mixed pool
    import pytest as _pytest

    with _pytest.raises(Exception, match="partitions other than 0"):
        tk.sync("T", hwm=0, produce=lambda df: None)

    pages = []
    got = tk.sync_partitions(
        "T", {0: 2, 1: 0}, produce=lambda df: pages.append(df.collect())
    )
    assert got == {0: 2, 1: 4}
    flat = [(r["offset"]) for p in pages for r in p]
    assert flat == [2, 3, 0, 1, 2, 3]  # partition 0 tail, then partition 1
    # bulk variant produces the same record set
    pages2 = []
    got2 = tk.sync_partitions(
        "T", {0: 2, 1: 0}, produce=lambda df: pages2.append(df.collect()),
        bulk=True, page_span=10,
    )
    assert got2 == got
    assert [r["offset"] for p in pages2 for r in p] == flat
    # parallel partitions: same per-partition counts and per-partition
    # page order (cross-partition interleaving is free — Kafka's own
    # contract); thread-safe list via lock
    import threading

    lock = threading.Lock()
    pages3: list = []

    def _collect(df):
        rows = df.collect()
        with lock:
            pages3.append(rows)

    got3 = tk.sync_partitions("T", {0: 2, 1: 0}, produce=_collect,
                              bulk=True, page_span=10, parallelism=2)
    assert got3 == got
    # same record set overall; within each produced page, offsets are
    # ascending (each partition's thread produces its pages in order)
    assert sorted(r["offset"] for page in pages3 for r in page) == sorted(flat)
    for page in pages3:
        offs = [r["offset"] for r in page]
        assert offs == sorted(offs)


def test_to_kafka_already_synced(spark, tmp_path):
    pool = Pool.create(spark, str(tmp_path / "Out2"))
    tk = ToKafka(pool, KEY_T, VAL_T, format="json")
    assert tk.sync("T", hwm=0, produce=lambda df: None) == 0


def test_wire_fidelity_full_loop(spark, tmp_path):
    """THE parity statement: records survive the complete zync loop —
    Avro Confluent wire frame → from-kafka ingest (decode + envelope +
    atomic pool commit) → to-kafka egress (encode back to wire) → decode
    — with key, value, topic, and offset all bit-identical to the input
    (ingest README.md:122-151 + egress README.md:166-180, one cycle)."""
    from zync_spark.sources.avro import decode_column

    reg = MemoryRegistry()
    pool = Pool.create(spark, str(tmp_path / "Loop"))
    rows = [("T", o, 100 + o, "c", f"name-{o}") for o in range(5)]
    frame = _wire_frame(spark, reg, rows)

    fk = FromKafka(spark, {"T": pool}, KEY_T, VAL_T, registry=reg, format="avro")
    committed = fk.commit_batch(frame)
    assert committed == {"T": 5}
    assert fk.resume_offsets() == {"T": 5}

    pages = []
    tk = ToKafka(pool, KEY_T, VAL_T, registry=reg, format="avro", batch_size=10)
    assert tk.sync("T", hwm=0, produce=lambda df: pages.append(df)) == 5

    out = pages[0]
    decoded = decode_column(
        decode_column(out, "key", KEY_T, reg), "value", VAL_T, reg
    )
    got = sorted(
        (r["topic"], r["offset"], r["key"]["ID"], r["value"]["op"], r["value"]["name"])
        for r in decoded.collect()
    )
    assert got == [(t, o, k, op, nm) for t, o, k, op, nm in rows]


def test_from_kafka_multipartition_resume_and_guard(spark, tmp_path):
    """Multi-partition ingest (beyond the reference's pinned partition 0):
    each partition's offset sequence resumes independently, and the
    monotonicity guard trips per (topic, partition)."""
    reg = MemoryRegistry()
    pool = Pool.create(spark, str(tmp_path / "M"))
    fk = FromKafka(spark, {"M": pool}, KEY_T, VAL_T, registry=reg, format="avro")

    def frame(rows):
        """rows: (partition, offset, key_id, op, name)."""
        typed = spark.createDataFrame(
            [("M", p, o, (k,), (op, nm)) for p, o, k, op, nm in rows],
            S(
                [
                    Fld("topic", StringType()),
                    Fld("partition", LongType()),
                    Fld("offset", LongType()),
                    Fld("key", KEY_T),
                    Fld("value", VAL_T),
                ]
            ),
        )
        wire = encode_column(typed, "key", KEY_T, reg)
        return encode_column(wire, "value", VAL_T, reg)

    # partitions 0 and 1 carry independent offset sequences
    assert fk.commit_batch(
        frame([(0, 0, 1, "c", "a"), (0, 1, 2, "c", "b"), (1, 0, 3, "c", "x")])
    ) == {"M": 3}
    assert fk.resume_offsets_by_partition() == {"M": {0: 2, 1: 1}}

    # partition 1 advancing while partition 0 is idle is fine
    assert fk.commit_batch(frame([(1, 1, 4, "c", "y")])) == {"M": 1}
    assert fk.resume_offsets_by_partition() == {"M": {0: 2, 1: 2}}

    # an offset at partition 0's HWM is fine even though it is BELOW
    # partition 1's — the guard must be per partition, not per topic
    assert fk.commit_batch(frame([(0, 2, 5, "u", "a2")])) == {"M": 1}

    # redelivery below one partition's resume point is filtered as a
    # duplicate — per partition, not per topic
    assert fk.commit_batch(frame([(1, 0, 3, "c", "x")])) == {}


def test_from_kafka_dead_letter_routing(spark, tmp_path):
    """Malformed values route to the dead-letter pool with raw bytes;
    well-formed records in the same batch commit normally."""
    from zync_spark.sources import connectjson

    pool = Pool.create(spark, str(tmp_path / "D"))
    dlq = Pool.create(spark, str(tmp_path / "D_dlq"))
    fk = FromKafka(spark, {"D": pool}, KEY_T, VAL_T, format="json",
                   dead_letter_pool=dlq)

    good_key = spark.range(1).select(
        connectjson.encode(F.struct(F.lit(7).alias("ID")), KEY_T).cast("binary")
    ).collect()[0][0]
    good_val = spark.range(1).select(
        connectjson.encode(
            F.struct(F.lit("c").alias("op"), F.lit("ok").alias("name")), VAL_T
        ).cast("binary")
    ).collect()[0][0]
    frame = spark.createDataFrame(
        [
            ("D", 0, 0, good_key, good_val),
            ("D", 0, 1, good_key, b"this is not connect-json"),
        ],
        FRAME_T,
    )
    assert fk.commit_batch(frame) == {"D": 1}
    assert pool.scan().filter(F.col("zed_type") == "data").count() == 1
    dead = dlq.scan().collect()
    assert len(dead) == 1
    assert dead[0]["zed_type"] == "dlq"
    assert dead[0]["kafka"]["offset"] == 1
    assert bytes(dead[0]["raw_value"]) == b"this is not connect-json"


def _env_schema():
    return S(
        [
            Fld("kafka", S([Fld("topic", StringType()), Fld("partition", LongType()), Fld("offset", LongType())])),
            Fld("key", KEY_T),
            Fld("value", VAL_T),
            Fld("zed_type", StringType()),
        ]
    )


def test_to_kafka_offset_gaps_no_duplicates(spark, tmp_path):
    # compacted/transactional topics leave offset gaps; the cursor must
    # advance to max(page)+1, never by row count, or gapped records
    # re-produce every page
    pool = Pool.create(spark, str(tmp_path / "Gap"))
    rows = [(("T", 0, o), (o,), ("c", f"r{o}"), "data") for o in (0, 5, 6, 9)]
    pool.load(spark.createDataFrame(rows, _env_schema()))

    seen = []
    tk = ToKafka(pool, KEY_T, VAL_T, format="json", batch_size=2)
    produced = tk.sync(
        "T", hwm=0,
        produce=lambda df: seen.extend(r["offset"] for r in df.collect()),
    )
    assert produced == 4
    assert seen == [0, 5, 6, 9]  # each exactly once, in order


def test_to_kafka_rejects_multipartition(spark, tmp_path):
    # single-HWM egress cannot order multiple partitions' sequences —
    # loud error, never silent interleave
    pool = Pool.create(spark, str(tmp_path / "MP"))
    rows = [(("T", 0, 0), (0,), ("c", "a"), "data"),
            (("T", 1, 0), (1,), ("c", "b"), "data")]
    pool.load(spark.createDataFrame(rows, _env_schema()))
    tk = ToKafka(pool, KEY_T, VAL_T, format="json")
    with pytest.raises(ValueError, match="partitions other than 0"):
        tk.sync("T", hwm=0, produce=lambda df: None)


def test_to_kafka_egress_shaper(spark, tmp_path):
    """Egress shaper (the reference's `| head N | shaper | sort` slot,
    fifo/lake.go:84-92): applied per page before encode; a FILTERING shaper
    must not under-advance the cursor (the pager books offsets pre-shaper,
    unlike the reference's advance-by-batch-length)."""
    pool = Pool.create(spark, str(tmp_path / "Shp"))
    env_schema = S(
        [
            Fld("kafka", S([Fld("topic", StringType()), Fld("partition", LongType()), Fld("offset", LongType())])),
            Fld("key", KEY_T),
            Fld("value", VAL_T),
            Fld("zed_type", StringType()),
        ]
    )
    rows = [(("T", 0, i), (i,), ("c", f"r{i}"), "data") for i in range(6)]
    pool.load(spark.createDataFrame(rows, env_schema))

    # transforming shaper: rows keep flowing, values uppercased
    pages = []
    tk = ToKafka(pool, KEY_T, VAL_T, format="json", batch_size=4,
                 shaper='value.name := to_upper(value.name)')
    assert tk.sync("T", hwm=0, produce=lambda df: pages.append(df.collect())) == 6
    payloads = [bytes(r["value"]).decode() for p in pages for r in p]
    assert all('"R' in s for s in payloads)  # r0→R0 ...

    # filtering shaper: only even offsets produced, but the cursor still
    # drains the pool exactly once (no refetch loop, count = pre-shaper)
    pages2 = []
    tk2 = ToKafka(pool, KEY_T, VAL_T, format="json", batch_size=4,
                  shaper='kafka.offset % 2 == 0')
    n = tk2.sync("T", hwm=0, produce=lambda df: pages2.append(df.collect()))
    assert n == 6  # bookkeeping counts scanned records (cursor integrity)
    sent = [r["offset"] for p in pages2 for r in p]
    assert sent == [0, 2, 4]


@pytest.mark.slow
def test_streaming_index_maintenance(spark, tmp_path):
    """FromKafka(indexes=[...]) keeps a dedup index fresh to within one
    micro-batch, exactly the rollup contract: commit_batch ingests, then
    the index sync consumes the cursor-bounded delta and discovers the
    cross-batch near-dup pair."""
    from tests.test_dedup_index import DOCS, SPEC
    from zync_spark.streaming import dedup_index as DI

    reg = MemoryRegistry()
    doc_t = S([Fld("doc_id", LongType()), Fld("text", StringType())])
    pool = Pool.create(spark, str(tmp_path / "docs"))
    idx = Pool.create(spark, str(tmp_path / "idx"))
    fk = FromKafka(spark, {"docs": pool}, KEY_T, doc_t, registry=reg,
                   format="avro", indexes=[(SPEC, idx, ["docs"])])

    def frame(rows):
        typed = spark.createDataFrame(
            [("docs", 0, o, (d,), (d, DOCS[d][1])) for o, d in rows],
            S([Fld("topic", StringType()), Fld("partition", LongType()),
               Fld("offset", LongType()), Fld("key", KEY_T),
               Fld("value", doc_t)]))
        wire = encode_column(typed, "key", KEY_T, reg)
        return encode_column(wire, "value", doc_t, reg)

    assert fk.commit_batch(frame([(0, 0), (1, 2)])) == {"docs": 2}
    assert DI.pairs_view(idx, SPEC).count() == 0   # no dup yet
    assert fk.commit_batch(frame([(2, 4), (3, 1)])) == {"docs": 2}
    pairs = {(r["id_a"], r["id_b"])
             for r in DI.pairs_view(idx, SPEC).collect()}
    assert pairs == {(2, 4), (0, 1)}  # cross-batch dups found per batch
    # a replayed batch commits nothing and the index stays put
    n_commits = len(idx.commits())
    assert fk.commit_batch(frame([(2, 4)])) == {}
    assert len(idx.commits()) == n_commits
    # bad spec type fails at construction
    with pytest.raises(TypeError):
        FromKafka(spark, {"docs": pool}, KEY_T, doc_t, registry=reg,
                  indexes=[(object(), idx, ["docs"])])


@pytest.mark.slow
def test_index_maintenance_inherits_auto_compact(spark, tmp_path):
    """ADVICE closure: auto_compact_every applies to the INDEX dest pools
    too — without it one un-clustered commit accretes per micro-batch and
    the bounded-probe contract silently degrades to full index reads."""
    import json
    import os

    from tests.test_dedup_index import DOCS, SPEC

    reg = MemoryRegistry()
    doc_t = S([Fld("doc_id", LongType()), Fld("text", StringType())])
    pool = Pool.create(spark, str(tmp_path / "docs"))
    idx = Pool.create(spark, str(tmp_path / "idx"))
    fk = FromKafka(spark, {"docs": pool}, KEY_T, doc_t, registry=reg,
                   format="avro", auto_compact_every=1,
                   indexes=[(SPEC, idx, ["docs"])])

    def frame(rows):
        typed = spark.createDataFrame(
            [("docs", 0, o, (d,), (d, DOCS[d][1])) for o, d in rows],
            S([Fld("topic", StringType()), Fld("partition", LongType()),
               Fld("offset", LongType()), Fld("key", KEY_T),
               Fld("value", doc_t)]))
        wire = encode_column(typed, "key", KEY_T, reg)
        return encode_column(wire, "value", doc_t, reg)

    assert fk.commit_batch(frame([(0, 0), (1, 2)])) == {"docs": 2}
    assert fk.commit_batch(frame([(2, 4), (3, 1)])) == {"docs": 2}
    # the index pool was folded into a base manifest on the same cadence
    # as the ingest pool (not just accreting delta commits)
    assert idx.commits_since_base() == 0
    bases = []
    for c in idx.commits():
        with open(os.path.join(idx.path, "_commits", c)) as f:
            if json.load(f).get("base"):
                bases.append(c)
    assert bases, "index dest pool never compacted"


def test_streaming_text_index_maintenance(spark, tmp_path):
    """FromKafka(indexes=[(TextIndexSpec, ...)]) keeps a BM25 text index
    fresh to within one micro-batch — the same contract as the dedup and
    ANN entries, third index family."""
    from tests.test_text_index import SPEC as TSPEC, _text
    from zync_spark.streaming import text_index as TI

    reg = MemoryRegistry()
    doc_t = S([Fld("doc_id", LongType()), Fld("text", StringType())])
    pool = Pool.create(spark, str(tmp_path / "docs"))
    idx = Pool.create(spark, str(tmp_path / "idx"))
    fk = FromKafka(spark, {"docs": pool}, KEY_T, doc_t, registry=reg,
                   format="avro", indexes=[(TSPEC, idx, ["docs"])])

    def frame(lo, hi):
        typed = spark.createDataFrame(
            [("docs", 0, i, (i,), (i, _text(i))) for i in range(lo, hi)],
            S([Fld("topic", StringType()), Fld("partition", LongType()),
               Fld("offset", LongType()), Fld("key", KEY_T),
               Fld("value", doc_t)]))
        wire = encode_column(typed, "key", KEY_T, reg)
        return encode_column(wire, "value", doc_t, reg)

    assert fk.commit_batch(frame(0, 12)) == {"docs": 12}
    assert TI.corpus_stats(idx, TSPEC)[0] == 12
    assert fk.commit_batch(frame(12, 20)) == {"docs": 8}
    assert TI.corpus_stats(idx, TSPEC)[0] == 20  # fresh within one batch
    hits = TI.search_text(idx, TSPEC, "spark", k=3)
    assert hits.count() == 3


@pytest.mark.slow
def test_streaming_span_index_maintenance(spark, tmp_path):
    """FromKafka(indexes=[(SpanIndexSpec, ...)]) keeps the duplicated-
    span index fresh to within one micro-batch — fourth index family,
    same dispatch contract; a cross-batch duplicate surfaces as soon as
    its later member's batch commits."""
    from tests.test_span_index import SPEC as SSPEC, TEXT
    from zync_spark.streaming import span_index as SI

    reg = MemoryRegistry()
    doc_t = S([Fld("doc_id", LongType()), Fld("text", StringType())])
    pool = Pool.create(spark, str(tmp_path / "docs"))
    idx = Pool.create(spark, str(tmp_path / "idx"))
    fk = FromKafka(spark, {"docs": pool}, KEY_T, doc_t, registry=reg,
                   format="avro", indexes=[(SSPEC, idx, ["docs"])])

    def frame(rows, lo):
        typed = spark.createDataFrame(
            [("docs", 0, lo + j, (d,), (d, TEXT[d]))
             for j, d in enumerate(rows)],
            S([Fld("topic", StringType()), Fld("partition", LongType()),
               Fld("offset", LongType()), Fld("key", KEY_T),
               Fld("value", doc_t)]))
        wire = encode_column(typed, "key", KEY_T, reg)
        return encode_column(wire, "value", doc_t, reg)

    # doc 0 alone: no duplicates yet
    assert fk.commit_batch(frame([0, 1], 0)) == {"docs": 2}
    assert SI.spans_view(idx, SSPEC).count() == 0
    # doc 2 shares tokens 0..9 with doc 0 → spans appear this batch
    assert fk.commit_batch(frame([2], 2)) == {"docs": 1}
    got = {(r["doc_id"], r["span_start"])
           for r in SI.spans_view(idx, SSPEC).collect()}
    assert got == {(0, 0), (2, 0)}
