"""End-to-end CLI test over a temp lake: produce envelope JSON → etl from a
YAML transform (+ --plan dump) → query → consume. Runs in-process (main()
with argv) so the shared test SparkSession is reused."""

from __future__ import annotations

import json
import os

import pytest

from tests.fixtures_invoices import BATCHES, INVOICES_YAML, ROW_SCHEMA

from zync_spark.cli import main


def _produce_file(spark, tmp_path, batch) -> str:
    # CLI produce reads JSON-lines envelope records
    df = spark.createDataFrame(batch, ROW_SCHEMA)
    path = os.path.join(tmp_path, "input")
    df.coalesce(1).write.mode("overwrite").json(path)
    files = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".json")]
    assert files
    return files[0]


def test_cli_produce_etl_query_consume(spark, tmp_path, capsys):
    lake = os.path.join(tmp_path, "lake")
    cfg = os.path.join(tmp_path, "invoices.yaml")
    with open(cfg, "w") as f:
        f.write(INVOICES_YAML)

    f1 = _produce_file(spark, tmp_path, BATCHES[0])
    assert main([
        "--lake", lake, "produce", f1, "--pool", "Raw",
        "--schema", ROW_SCHEMA.toDDL(),
    ]) == 0
    assert "loaded" in capsys.readouterr().out

    # plan dump (the analog of `zync etl -zed` golden program output)
    assert main(["--lake", lake, "etl", cfg, "--plan"]) == 0
    plan = capsys.readouterr().out
    assert "output pool Staging" in plan and "AdaptiveSparkPlan" in plan

    assert main(["--lake", lake, "etl", cfg]) == 0
    out = capsys.readouterr().out
    assert "ETL'd" in out and "ETL'd 0" not in out

    # rerun is a no-op (idempotent)
    assert main(["--lake", lake, "etl", cfg, "--message", "rerun"]) == 0
    assert "ETL'd 0 records" in capsys.readouterr().out

    assert main([
        "--lake", lake, "query",
        "SELECT count(*) AS n FROM Staging WHERE zed_type = 'data'",
    ]) == 0
    n = json.loads(capsys.readouterr().out.strip())["n"]
    assert n > 0

    # --explain prints the physical plan, not rows
    assert main([
        "--lake", lake, "query", "--explain",
        "SELECT count(*) AS n FROM Staging WHERE zed_type = 'data'",
    ]) == 0
    plan = capsys.readouterr().out
    assert "HashAggregate" in plan and "Scan parquet" in plan

    assert main([
        "--lake", lake, "consume", "NewInvoices", "--pool", "Staging",
    ]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == n
    offsets = [r["kafka"]["offset"] for r in lines]
    assert offsets == sorted(offsets)

    # time travel: as of the first Staging commit, same view (single etl)
    assert main([
        "--lake", lake, "consume", "NewInvoices", "--pool", "Staging", "--at", "0",
    ]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == n

    # zed filter over the envelope (--where compiles via zedexpr)
    assert main([
        "--lake", lake, "consume", "NewInvoices", "--pool", "Staging",
        "--where", 'kafka.offset >= 1 and zed_type == "data"',
    ]) == 0
    filtered = [
        json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert 0 < len(filtered) < n
    assert all(r["kafka"]["offset"] >= 1 for r in filtered)

    # csv output flattens the envelope to dotted columns
    assert main([
        "--lake", lake, "consume", "NewInvoices", "--pool", "Staging",
        "--format", "csv",
    ]) == 0
    csv_lines = capsys.readouterr().out.strip().splitlines()
    assert csv_lines[0].startswith("kafka.topic,kafka.partition,kafka.offset")
    assert len(csv_lines) == n + 1

    # distributed parquet dump + parquet produce round-trip into a new pool
    dump = os.path.join(tmp_path, "dump")
    assert main([
        "--lake", lake, "consume", "NewInvoices", "--pool", "Staging",
        "--format", "parquet", "--out", dump,
    ]) == 0
    assert main([
        "--lake", lake, "produce", dump, "--pool", "Rehydrated",
        "--format", "parquet",
    ]) == 0
    assert f"loaded {n} records" in capsys.readouterr().out
    assert main([
        "--lake", lake, "query", "SELECT count(*) AS n FROM Rehydrated",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["n"] == n

    # lake maintenance: compact + vacuum leave the query result unchanged
    assert main(["--lake", lake, "compact", "Staging", "--vacuum"]) == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "vacuumed" in out
    assert main([
        "--lake", lake, "query",
        "SELECT count(*) AS n FROM Staging WHERE zed_type = 'data'",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["n"] == n


def test_cli_from_kafka_to_kafka_file_transport(spark, tmp_path, capsys):
    """The reference's from-kafka/to-kafka commands, driven end-to-end over
    the file transport: queue → pool (streaming loop, --exitafter) →
    mirror queue (HWM-paged egress)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zync_spark.sources import connectjson
    from zync_spark.sources.filequeue import FileQueue

    key_t = StructType([StructField("ID", LongType())])
    val_t = StructType([StructField("name", StringType())])
    lake = os.path.join(tmp_path, "lake2")
    queue = FileQueue(os.path.join(tmp_path, "q"))

    typed = spark.createDataFrame(
        [((i,), (f"n{i}",)) for i in range(6)],
        StructType([StructField("key", key_t), StructField("value", val_t)]),
    )
    enc = typed.select(
        connectjson.encode(F.col("key"), key_t).cast("binary").alias("k"),
        connectjson.encode(F.col("value"), val_t).cast("binary").alias("v"),
    )
    queue.produce("T", [(r["k"], r["v"]) for r in enc.collect()])

    common = [
        "--key-schema", key_t.toDDL(), "--value-schema", val_t.toDDL(),
        "--transport", f"file:{queue.root}",
    ]
    assert main(["--lake", lake, "from-kafka", "T", *common, "--exitafter"]) == 0
    assert "synced topic T" in capsys.readouterr().out
    assert main([
        "--lake", lake, "query",
        "SELECT count(*) AS n FROM T WHERE zed_type = 'data'",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["n"] == 6

    mirror = FileQueue(os.path.join(tmp_path, "mirror"))
    assert main([
        "--lake", lake, "to-kafka", "T", "--pool", "T",
        "--key-schema", key_t.toDDL(), "--value-schema", val_t.toDDL(),
        "--transport", f"file:{mirror.root}",
    ]) == 0
    assert "produced 6 records" in capsys.readouterr().out
    assert mirror.end_offset("T") == 6
    # idempotent: mirror HWM says everything is already out
    assert main([
        "--lake", lake, "to-kafka", "T", "--pool", "T",
        "--key-schema", key_t.toDDL(), "--value-schema", val_t.toDDL(),
        "--transport", f"file:{mirror.root}",
    ]) == 0
    assert "produced 0 records" in capsys.readouterr().out


def test_cli_rollup_sync_view_fold(spark, tmp_path, capsys):
    import yaml as _yaml

    from zync_spark.pool import Pool
    from tests.test_incremental import BATCHES, ROW

    lake = os.path.join(tmp_path, "lake")
    src = Pool.create(spark, os.path.join(lake, "src"))
    spec_path = os.path.join(tmp_path, "rollup.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {
                "name": "by_k",
                "source": "src",
                "dest": "summary",
                "topics": ["t"],
                "keys": {"k": "value.k"},
                "aggs": [
                    {"col": "n", "kind": "count"},
                    {"col": "total", "kind": "sum",
                     "expr": "CAST(value.amt AS DECIMAL(10,2))"},
                ],
            },
            f,
        )

    def view():
        assert main(["--lake", lake, "rollup", "view", spec_path]) == 0
        return {
            json.loads(l)["k"]: json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
        }

    src.load(spark.createDataFrame(BATCHES[0], ROW), "b1")
    assert main(["--lake", lake, "rollup", "sync", spec_path]) == 0
    assert "partial rows committed" in capsys.readouterr().out
    v1 = view()
    assert v1["a"]["n"] == 2 and float(v1["a"]["total"]) == 4.5

    # second batch accrues; fold preserves the view
    src.load(spark.createDataFrame(BATCHES[1], ROW), "b2")
    assert main(["--lake", lake, "rollup", "sync", spec_path]) == 0
    capsys.readouterr()
    before = view()
    assert before["b"]["n"] == 2 and before["c"]["n"] == 1
    assert main(["--lake", lake, "rollup", "fold", spec_path]) == 0
    capsys.readouterr()
    assert view() == before


def test_cli_profile(spark, tmp_path, capsys):
    from zync_spark.pool import Pool
    from tests.test_incremental import BATCHES, ROW

    lake = os.path.join(tmp_path, "lake")
    src = Pool.create(spark, os.path.join(lake, "src"))
    src.load(spark.createDataFrame(BATCHES[0] + BATCHES[1], ROW), "b")
    assert main(["--lake", lake, "profile", "src",
                 "--columns", "value.k", "value.amt"]) == 0
    out = {json.loads(l)["col"]: json.loads(l)
           for l in capsys.readouterr().out.strip().splitlines()}
    assert out["value.k"]["n_distinct"] == 3
    assert out["value.amt"]["n_rows"] == 5
    # zed --where filter composes
    assert main(["--lake", lake, "profile", "src",
                 "--columns", "value.k", "--where", 'value.k=="a"']) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n_rows"] == 2


def test_cli_from_kafka_with_rollup(spark, tmp_path, capsys):
    """from-kafka --rollup keeps a streaming materialized view in sync
    with the ingest loop, queryable via the rollup CLI."""
    import yaml as _yaml
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zync_spark.sources import connectjson
    from zync_spark.sources.filequeue import FileQueue

    key_t = StructType([StructField("ID", LongType())])
    val_t = StructType([StructField("name", StringType())])
    lake = os.path.join(tmp_path, "lake3")
    queue = FileQueue(os.path.join(tmp_path, "q3"))
    spec_path = os.path.join(tmp_path, "by_name.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {"name": "by_name", "source": "T", "dest": "summary",
             "topics": ["T"], "keys": {"nm": "value.name"},
             "aggs": [{"col": "n", "kind": "count"}]},
            f,
        )

    typed = spark.createDataFrame(
        [((i,), ("a" if i % 2 else "b",)) for i in range(6)],
        StructType([StructField("key", key_t), StructField("value", val_t)]),
    )
    enc = typed.select(
        connectjson.encode(F.col("key"), key_t).cast("binary").alias("k"),
        connectjson.encode(F.col("value"), val_t).cast("binary").alias("v"),
    )
    queue.produce("T", [(r["k"], r["v"]) for r in enc.collect()])

    assert main([
        "--lake", lake, "from-kafka", "T",
        "--key-schema", key_t.toDDL(), "--value-schema", val_t.toDDL(),
        "--transport", f"file:{queue.root}", "--exitafter",
        "--rollup", spec_path,
    ]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "rollup", "view", spec_path]) == 0
    got = {json.loads(l)["nm"]: json.loads(l)["n"]
           for l in capsys.readouterr().out.strip().splitlines()}
    assert got == {"a": 3, "b": 3}


def test_cli_log(spark, tmp_path, capsys):
    from zync_spark.pool import Pool
    from tests.test_incremental import BATCHES, ROW

    lake = os.path.join(tmp_path, "lake4")
    pool = Pool.create(spark, os.path.join(lake, "p"))
    pool.load(spark.createDataFrame(BATCHES[0], ROW), "first")
    pool.load(spark.createDataFrame(BATCHES[1], ROW), "second")
    pool.compact(message="fold")
    assert main(["--lake", lake, "log", "p"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["seq"] for l in lines] == [0, 1, 2]
    assert [l["message"] for l in lines] == ["first", "second", "fold"]
    assert lines[2]["base"] is True and lines[2]["rows"] == 5
    assert lines[0]["stats"] == {"t": [0, 2], "t#0": [0, 2]}


def test_cli_dedup_index_sync_pairs(spark, tmp_path, capsys):
    import yaml as _yaml

    from zync_spark.pool import Pool
    from tests.test_dedup_index import BATCHES, DOCS, ROW, _load_batch

    lake = os.path.join(tmp_path, "lake")
    src = Pool.create(spark, os.path.join(lake, "src"))
    spec_path = os.path.join(tmp_path, "didx.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {
                "name": "docs", "source": "src", "dest": "idx",
                "topics": ["docs"], "id": "value.doc_id",
                "text": "value.text",
            },
            f,
        )
    start = 0
    for batch in BATCHES:
        start = _load_batch(spark, src, batch, start)
        assert main(["--lake", lake, "dedup-index", "sync", spec_path]) == 0
        assert "rows committed" in capsys.readouterr().out
    assert main(["--lake", lake, "dedup-index", "pairs", spec_path]) == 0
    pairs = {
        (json.loads(l)["id_a"], json.loads(l)["id_b"])
        for l in capsys.readouterr().out.strip().splitlines()
    }
    assert (2, 4) in pairs  # the engineered cross-batch near-dup
    # bounded point lookup: only pairs whose canonical smaller member
    # is listed, plus the probe telemetry comment line
    assert main(["--lake", lake, "dedup-index", "pairs", spec_path,
                 "--ids", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    got = {(json.loads(l)["id_a"], json.loads(l)["id_b"])
           for l in out if not l.startswith("#")}
    assert got == {k for k in pairs if k[0] == 2}
    assert any(l.startswith("# probe read") for l in out)
    assert main(["--lake", lake, "dedup-index", "index", spec_path]) == 0
    idx = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["doc_id"] for r in idx] == [d for d, _ in DOCS]


@pytest.mark.slow
def test_cli_ann_index_and_types(spark, tmp_path, capsys):
    import yaml as _yaml

    from tests.test_ann_index import ROW as AROW, _vec
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_ann")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows = [(("emb", 0, i), "data", (i, _vec(i))) for i in range(24)]
    src.load(spark.createDataFrame(rows, AROW), "backfill",
             type_names={"value.emb": "embedding_t"})
    spec_path = os.path.join(tmp_path, "aidx.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {"name": "emb", "source": "src", "dest": "aidx",
             "topics": ["emb"], "id": "value.vec_id", "vec": "value.emb",
             "n_cells": 4}, f)
    assert main(["--lake", lake, "ann-index", "sync", spec_path]) == 0
    assert "rows committed" in capsys.readouterr().out
    assert main(["--lake", lake, "ann-index", "compact", spec_path]) == 0
    assert "compacted" in capsys.readouterr().out
    assert main(["--lake", lake, "ann-index", "cells", spec_path]) == 0
    cells = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert sum(c["n_vecs"] for c in cells) == 24 and len(cells) >= 2
    # rebuild: retrain over the stored corpus in one base commit
    assert main(["--lake", lake, "ann-index", "rebuild", spec_path]) == 0
    assert "rebuilt" in capsys.readouterr().out
    assert main(["--lake", lake, "ann-index", "cells", spec_path]) == 0
    cells2 = [json.loads(l)
              for l in capsys.readouterr().out.strip().splitlines()]
    assert sum(c["n_vecs"] for c in cells2) == 24  # no vector lost
    # recall: quality curve per nprobe, exact at full probe
    assert main(["--lake", lake, "ann-index", "recall", spec_path,
                 "--queries", "8"]) == 0
    curve = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert [c["nprobe"] for c in curve][-1] >= 2  # ends at n_cells
    assert curve[-1]["avg_recall_at10"] == 1.0    # full probe is exact
    # types: the named-type registry sidecar prints as JSON lines
    assert main(["--lake", lake, "types", "src"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "path": "value.emb", "name": "embedding_t"}


@pytest.mark.slow
def test_cli_text_index(spark, tmp_path, capsys):
    import yaml as _yaml

    from tests.test_text_index import ROW as TROW, _text
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_txt")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows = [(("docs", 0, i), "data", (i, _text(i))) for i in range(30)]
    src.load(spark.createDataFrame(rows, TROW), "backfill")
    spec_path = os.path.join(tmp_path, "tidx.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {"kind": "text", "name": "d", "source": "src", "dest": "tidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text"}, f)
    assert main(["--lake", lake, "text-index", "sync", spec_path]) == 0
    assert "rows committed" in capsys.readouterr().out
    assert main(["--lake", lake, "text-index", "compact", spec_path]) == 0
    assert "compacted" in capsys.readouterr().out
    assert main(["--lake", lake, "text-index", "search", spec_path,
                 "--query", "spark table", "-k", "4"]) == 0
    hits = [json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 4
    assert [h["rank"] for h in sorted(hits, key=lambda h: h["rank"])] \
        == [1, 2, 3, 4]
    assert all(h["score"] > 0 for h in hits)


@pytest.mark.slow
def test_cli_retrieve_hybrid(spark, tmp_path, capsys):
    """`retrieve` fuses text-index BM25 with ann-index cosine by RRF —
    both indexes over one shared id space (ids 0..23)."""
    import json as _json

    import pytest
    import yaml as _yaml

    from tests.test_ann_index import ROW as AROW, _vec
    from tests.test_text_index import ROW as TROW, _text
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_hy")
    tsrc = Pool.create(spark, os.path.join(lake, "tsrc"))
    tsrc.load(spark.createDataFrame(
        [(("docs", 0, i), "data", (i, _text(i))) for i in range(24)], TROW),
        "backfill")
    asrc = Pool.create(spark, os.path.join(lake, "asrc"))
    asrc.load(spark.createDataFrame(
        [(("emb", 0, i), "data", (i, _vec(i))) for i in range(24)], AROW),
        "backfill")
    tspec = os.path.join(tmp_path, "tidx.yaml")
    with open(tspec, "w") as f:
        _yaml.safe_dump(
            {"kind": "text", "name": "d", "source": "tsrc", "dest": "tidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text"}, f)
    aspec = os.path.join(tmp_path, "aidx.yaml")
    with open(aspec, "w") as f:
        _yaml.safe_dump(
            {"name": "emb", "source": "asrc", "dest": "aidx",
             "topics": ["emb"], "id": "value.vec_id", "vec": "value.emb",
             "n_cells": 4}, f)
    assert main(["--lake", lake, "text-index", "sync", tspec]) == 0
    assert main(["--lake", lake, "ann-index", "sync", aspec]) == 0
    capsys.readouterr()
    # by stored vector id
    assert main(["--lake", lake, "retrieve", tspec, aspec,
                 "--query", "spark table", "--vec-id", "3",
                 "-k", "5", "-n", "8", "--nprobe", "4"]) == 0
    rows = [_json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(r["rrf"] > 0 for r in rows)
    # every fused row came from at least one ranker, and the query
    # vector itself is excluded from its own semantic neighbors
    assert all(r["lex_rank"] is not None or r["sem_rank"] is not None
               for r in rows)
    assert all(r["sem_rank"] is None for r in rows if r["doc_id"] == 3)
    # by inline JSON vector: query id -1 never collides with stored ids
    assert main(["--lake", lake, "retrieve", tspec, aspec,
                 "--query", "spark table",
                 "--vec", _json.dumps(_vec(3)), "-k", "5"]) == 0
    rows2 = [_json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows2) == 5 and rows2[0]["rrf"] > 0
    # neither --vec nor --vec-id is an error
    with pytest.raises(SystemExit, match="--vec or --vec-id"):
        main(["--lake", lake, "retrieve", tspec, aspec,
              "--query", "spark table"])
    # malformed --vec fails cleanly, not with a JSON traceback
    for bad in ("not json", "{}", "[]", '["a"]'):
        with pytest.raises(SystemExit, match="JSON number array"):
            main(["--lake", lake, "retrieve", tspec, aspec,
                  "--query", "spark table", "--vec", bad])
    # weighted RRF: all weight on the semantic leg -> its #1 leads;
    # --explain appends per-leg probe telemetry comments
    assert main(["--lake", lake, "retrieve", tspec, aspec,
                 "--query", "spark table", "--vec-id", "3",
                 "-k", "3", "--weights", "0,1", "--explain"]) == 0
    wlines = capsys.readouterr().out.strip().splitlines()
    wrows = [_json.loads(l) for l in wlines if not l.startswith("#")]
    assert wrows[0]["sem_rank"] == 1
    assert any(l.startswith("# lexical probe read") for l in wlines)
    assert any(l.startswith("# semantic probe read") for l in wlines)
    with pytest.raises(SystemExit, match="comma-separated"):
        main(["--lake", lake, "retrieve", tspec, aspec,
              "--query", "spark table", "--vec-id", "3",
              "--weights", "0.7"])


def test_text_spec_requires_kind_discriminator(tmp_path):
    """Round-5 review closure: a text-index YAML without 'kind: text'
    must fail LOUDLY everywhere — its fields are a subset of the dedup
    spec's, so silent misdispatch (from-kafka --index building a MinHash
    index into the text index's dest pool) was possible. Both loaders
    now enforce the discriminator."""
    import pytest
    import yaml as _yaml

    from zync_spark.streaming.dedup_index import load_index_spec
    from zync_spark.streaming.text_index import load_text_spec

    p = os.path.join(tmp_path, "spec.yaml")
    doc = {"name": "d", "source": "s", "dest": "i", "topics": ["t"],
           "id": "value.doc_id", "text": "value.text"}
    with open(p, "w") as f:
        _yaml.safe_dump(doc, f)
    with pytest.raises(ValueError, match="kind: text"):
        load_text_spec(p)          # text loader refuses undeclared YAML
    load_index_spec(p)             # ...which IS a valid dedup spec
    doc["kind"] = "text"
    with open(p, "w") as f:
        _yaml.safe_dump(doc, f)
    spec, _ = load_text_spec(p)    # declared: text loader accepts
    assert type(spec).__name__ == "TextIndexSpec"
    with pytest.raises(ValueError):
        load_index_spec(p)         # ...and the dedup loader refuses
    doc["kind"] = "span"
    doc["window"] = 4
    with open(p, "w") as f:
        _yaml.safe_dump(doc, f)
    with pytest.raises(ValueError):
        load_index_spec(p)         # dedup loader refuses span YAMLs too
    from zync_spark.streaming.span_index import load_span_spec

    spec, _ = load_span_spec(p)
    assert type(spec).__name__ == "SpanIndexSpec" and spec.window == 4


def test_cli_span_index(spark, tmp_path, capsys):
    import yaml as _yaml

    from tests.test_span_index import BATCHES, ROW as SROW, TEXT
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_span")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows, off = [], 0
    for batch in BATCHES:
        for d in batch:
            rows.append((("docs", 0, off), "data", (d, TEXT[d])))
            off += 1
    src.load(spark.createDataFrame(rows, SROW), "backfill")
    spec_path = os.path.join(tmp_path, "sidx.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {"kind": "span", "name": "d", "source": "src", "dest": "sidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text", "window": 4}, f)
    assert main(["--lake", lake, "span-index", "sync", spec_path]) == 0
    assert "rows committed" in capsys.readouterr().out
    assert main(["--lake", lake, "span-index", "compact", spec_path]) == 0
    assert "compacted" in capsys.readouterr().out
    assert main(["--lake", lake, "span-index", "spans", spec_path,
                 "--docs", "0"]) == 0
    out = [json.loads(l)
           for l in capsys.readouterr().out.strip().splitlines()]
    # doc 0's duplicated region is the full 16 shared tokens
    assert out == [{"doc_id": 0, "span_start": 0, "span_end": 15,
                    "span_tokens": 16}]


@pytest.mark.slow
def test_cli_index_rebuild_verbs(spark, tmp_path, capsys):
    """The rebuild verbs re-bucket in place and tell the operator to
    update the spec YAML; missing knobs fail with guidance."""
    import pytest
    import yaml as _yaml

    from tests.test_span_index import BATCHES, ROW as SROW, TEXT
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_rb")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows, off = [], 0
    for batch in BATCHES:
        for d in batch:
            rows.append((("docs", 0, off), "data", (d, TEXT[d])))
            off += 1
    src.load(spark.createDataFrame(rows, SROW), "backfill")
    spec_path = os.path.join(tmp_path, "sidx.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {"kind": "span", "name": "d", "source": "src", "dest": "sidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text", "window": 4}, f)
    assert main(["--lake", lake, "span-index", "sync", spec_path]) == 0
    capsys.readouterr()
    with pytest.raises(SystemExit, match="min-docs"):
        main(["--lake", lake, "span-index", "rebuild", spec_path])
    assert main(["--lake", lake, "span-index", "rebuild", spec_path,
                 "--prefix-len", "3"]) == 0
    out = capsys.readouterr().out
    assert "prefix_len=3" in out and "update the spec YAML" in out
    # the YAML (still prefix_len=2) is now the drifted contract
    with pytest.raises(ValueError, match="fixed for the life"):
        main(["--lake", lake, "span-index", "spans", spec_path])


@pytest.mark.slow
def test_cli_index_delete_verbs(spark, tmp_path, capsys):
    """Each index family's `delete` verb tombstones ids out of the
    LATEST state: the view/search verbs stop serving them immediately
    (mask), and `compact` folds the tombstones physically."""
    import yaml as _yaml

    from tests.test_text_index import ROW as TROW, _text
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_del")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows = [(("docs", 0, i), "data", (i, _text(i))) for i in range(30)]
    src.load(spark.createDataFrame(rows, TROW), "backfill")

    tspec = os.path.join(tmp_path, "t.yaml")
    with open(tspec, "w") as f:
        _yaml.safe_dump(
            {"kind": "text", "name": "d", "source": "src", "dest": "tidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text"}, f)
    assert main(["--lake", lake, "text-index", "sync", tspec]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "text-index", "search", tspec,
                 "--query", "spark table", "-k", "30"]) == 0
    before = {json.loads(l)["doc_id"]
              for l in capsys.readouterr().out.strip().splitlines()}
    victims = sorted(before)[:2]
    assert main(["--lake", lake, "text-index", "delete", tspec,
                 "--ids", ",".join(map(str, victims))]) == 0
    assert "tombstone rows committed" in capsys.readouterr().out
    assert main(["--lake", lake, "text-index", "search", tspec,
                 "--query", "spark table", "-k", "30"]) == 0
    after = {json.loads(l)["doc_id"]
             for l in capsys.readouterr().out.strip().splitlines()}
    assert not (after & set(victims)) and after
    assert main(["--lake", lake, "text-index", "compact", tspec]) == 0

    sspec = os.path.join(tmp_path, "s.yaml")
    with open(sspec, "w") as f:
        _yaml.safe_dump(
            {"kind": "span", "name": "d", "source": "src", "dest": "sidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text", "window": 4, "min_docs": 2}, f)
    assert main(["--lake", lake, "span-index", "sync", sspec]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "span-index", "spans", sspec]) == 0
    spans = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    if spans:
        victim = spans[0]["doc_id"]
        assert main(["--lake", lake, "span-index", "delete", sspec,
                     "--ids", str(victim)]) == 0
        assert "committed" in capsys.readouterr().out
        assert main(["--lake", lake, "span-index", "spans", sspec]) == 0
        left = [json.loads(l)
                for l in capsys.readouterr().out.strip().splitlines()]
        assert all(sp["doc_id"] != victim for sp in left)


@pytest.mark.slow
def test_cli_retrieve_where(spark, tmp_path, capsys):
    """`retrieve --where` filters BOTH legs through a metadata predicate
    over the text source pool's rows."""
    import json as _json

    import pytest
    import yaml as _yaml

    from tests.test_ann_index import ROW as AROW, _vec
    from tests.test_text_index import ROW as TROW, _text
    from zync_spark.pool import Pool

    lake = os.path.join(tmp_path, "lake_hw")
    tsrc = Pool.create(spark, os.path.join(lake, "tsrc"))
    tsrc.load(spark.createDataFrame(
        [(("docs", 0, i), "data", (i, _text(i))) for i in range(24)], TROW),
        "backfill")
    asrc = Pool.create(spark, os.path.join(lake, "asrc"))
    asrc.load(spark.createDataFrame(
        [(("emb", 0, i), "data", (i, _vec(i))) for i in range(24)], AROW),
        "backfill")
    tspec = os.path.join(tmp_path, "tidx.yaml")
    with open(tspec, "w") as f:
        _yaml.safe_dump(
            {"kind": "text", "name": "d", "source": "tsrc", "dest": "tidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text"}, f)
    aspec = os.path.join(tmp_path, "aidx.yaml")
    with open(aspec, "w") as f:
        _yaml.safe_dump(
            {"name": "emb", "source": "asrc", "dest": "aidx",
             "topics": ["emb"], "id": "value.vec_id", "vec": "value.emb",
             "n_cells": 4}, f)
    assert main(["--lake", lake, "text-index", "sync", tspec]) == 0
    assert main(["--lake", lake, "ann-index", "sync", aspec]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "retrieve", tspec, aspec,
                 "--query", "spark table", "--vec-id", "3",
                 "-k", "8", "-n", "12", "--nprobe", "4",
                 "--where", "value.doc_id % 2 = 0"]) == 0
    rows = [_json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["doc_id"] % 2 == 0 for r in rows)
    # a bad predicate fails cleanly
    with pytest.raises(SystemExit, match="bad --where"):
        main(["--lake", lake, "retrieve", tspec, aspec,
              "--query", "spark table", "--vec-id", "3",
              "--where", "no_such_column ="])
