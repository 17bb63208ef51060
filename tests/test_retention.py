"""Retention/vacuum policy over tombstones (round 7): masked-fraction
health (check_pool_health), the family-agnostic fold (fold_compact),
age-based vacuum, the maintainer loop that closes it per POOL, and the
round-6 ADVICE fixes (EmptyIndexError vs drift, per-index health
kwargs, the no-improvement rebuild cooldown)."""

import json
import os
import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from zync_spark.pool import Pool
from zync_spark.streaming import dedup_index as DI
from zync_spark.streaming import text_index as TI
from zync_spark.streaming.from_kafka import FromKafka
from zync_spark.streaming.health import EmptyIndexError, check_pool_health
from zync_spark.streaming.tombstones import (fold_compact, read_tombs)


def _env(spark, rows, part=0, topic="docs"):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        F.struct(F.lit(topic).alias("topic"),
                 F.lit(part).cast("long").alias("partition"),
                 F.col("doc_id").cast("long").alias("offset")).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct("doc_id", "text").alias("value"))


def _docs(n=12):
    # near-dup pairs (2i, 2i+1) so the index carries duppair rows too
    base = [f"alpha{w} beta{w} gamma{w} delta{w} eps{w} zeta{w}"
            for w in range(n // 2)]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t + " one two three four"))
        rows.append((2 * i + 1, t + " one two three five"))
    return rows


def _spec():
    return DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                             k=3, num_hashes=32, bands=8, threshold=0.5)


def test_pool_health_lifecycle(spark, tmp_path):
    """Delete-heavy pool crosses the masked-fraction threshold; the
    fold reclaims masked rows AND tombstones; vacuum physically deletes
    the superseded files; the surviving pairs are identical before and
    after (hash-stable across the maintenance pass); reads drop the
    mask join (read_tombs goes None)."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, _docs()), "all")
    DI.sync_index(src, dst, spec, ["docs"])

    # healthy before any delete
    v0 = check_pool_health(dst)
    assert v0["healthy"] and v0["masked_rows"] == 0
    assert v0["live_tombstones"] == 0 and v0["recommendation"] is None

    # delete a third of the docs -> well past a 10% threshold
    dying = [i for i in range(12) if i % 3 == 0]
    DI.tombstone_index(dst, spec, dying)
    before = sorted(
        (r["id_a"], r["id_b"])
        for r in DI.pairs_view(dst, spec).collect())

    v1 = check_pool_health(dst, max_masked_fraction=0.1)
    assert not v1["healthy"] and v1["masked_rows"] > 0
    assert v1["live_tombstones"] == len(dying)
    assert 0 < v1["masked_fraction"] < 1
    assert v1["live_rows"] == v1["rows"] - v1["masked_rows"]
    assert "fold_compact" in v1["recommendation"]
    assert v1["compact_args"] == {}

    fold_compact(dst, specs=[spec])
    removed = dst.vacuum(retention_s=0.0)
    assert removed > 0  # superseded files physically gone

    v2 = check_pool_health(dst, max_masked_fraction=0.1,
                           vacuum_after_s=0.0)
    assert v2["healthy"] and v2["masked_rows"] == 0
    assert v2["live_tombstones"] == 0
    assert v2["unreferenced_files"] == 0
    assert read_tombs(dst, "docs") is None  # mask join vanishes
    after = sorted(
        (r["id_a"], r["id_b"])
        for r in DI.pairs_view(dst, spec).collect())
    assert before == after


def test_pool_health_empty_raises(spark, tmp_path):
    dst = Pool.create(spark, str(tmp_path / "idx"))
    with pytest.raises(EmptyIndexError):
        check_pool_health(dst)


def test_fold_compact_refuses_conflicting_dedup_specs(spark, tmp_path):
    dst = Pool.create(spark, str(tmp_path / "idx"))
    a = DI.DedupIndexSpec("a", "value.doc_id", "value.text", prefix_len=2)
    b = DI.DedupIndexSpec("b", "value.doc_id", "value.text", prefix_len=3)
    with pytest.raises(ValueError, match="prefix_len"):
        fold_compact(dst, specs=[a, b])


@pytest.mark.slow
def test_maintainer_retention_pass(spark, tmp_path):
    """FromKafka's health cadence closes the retention loop: a
    delete-heavy index pool is folded + vacuumed by the maintainer
    itself (auto_rebuild), with thresholds from health_opts['pool']."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, _docs()), "all")
    DI.sync_index(src, dst, spec, ["docs"])
    DI.tombstone_index(dst, spec, [0, 3, 6, 9])
    before = sorted(
        (r["id_a"], r["id_b"])
        for r in DI.pairs_view(dst, spec).collect())

    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"docs": src}, sub, sub, format="json",
                   indexes=[(spec, dst, ["docs"])],
                   health_every=1, auto_rebuild=True,
                   health_opts={"pool": {"max_masked_fraction": 0.05}},
                   auto_vacuum_s=0.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        verdicts = fk._run_health_checks()
    pool_v = [v for v in verdicts if v["family"] == "pool"]
    assert len(pool_v) == 1 and not pool_v[0]["healthy"]
    assert any("retention" in str(x.message) for x in w)
    # folded: tombstones gone, pairs unchanged, superseded files deleted
    assert read_tombs(dst, "docs") is None
    after = sorted(
        (r["id_a"], r["id_b"])
        for r in DI.pairs_view(dst, spec).collect())
    assert before == after
    v2 = [v for v in fk._run_health_checks() if v["family"] == "pool"]
    assert v2 and v2[0]["healthy"] and v2[0]["masked_rows"] == 0


@pytest.mark.slow
def test_maintainer_one_fold_per_pool(spark, tmp_path):
    """Two specs sharing one dest pool get ONE retention verdict and ONE
    fold (multi-tenant contract): the commit log grows by exactly one
    base manifest."""
    dspec = _spec()
    tspec = TI.TextIndexSpec("docs", "value.doc_id", "value.text")
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, _docs()), "all")
    DI.sync_index(src, dst, dspec, ["docs"])
    TI.sync_text(src, dst, tspec, ["docs"])
    DI.tombstone_index(dst, dspec, [0, 3, 6, 9])
    TI.tombstone_text(dst, tspec, [0, 3, 6, 9])

    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"docs": src}, sub, sub, format="json",
                   indexes=[(dspec, dst, ["docs"]),
                            (tspec, dst, ["docs"])],
                   health_every=1, auto_rebuild=True,
                   health_opts={"pool": {"max_masked_fraction": 0.05}})
    n_before = len(dst.commits())
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        verdicts = fk._run_health_checks()
    assert [v["family"] for v in verdicts].count("pool") == 1
    assert len(dst.commits()) == n_before + 1  # exactly one fold commit
    assert read_tombs(dst, "docs") is None


def test_drift_valueerror_propagates(spark, tmp_path):
    """A spec-drift ValueError must NOT be swallowed as 'empty index'
    (round-6 ADVICE): the maintainer fails loud on a misconfigured
    spec instead of silently skipping its health forever."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, _docs()), "all")
    DI.sync_index(src, dst, spec, ["docs"])

    drifted = DI.DedupIndexSpec("docs", "value.doc_id", "value.text",
                                k=3, num_hashes=32, bands=8,
                                threshold=0.5,
                                prefix_len=spec.prefix_len + 1)
    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"docs": src}, sub, sub, format="json",
                   indexes=[(drifted, dst, ["docs"])], health_every=1)
    with pytest.raises(ValueError, match="prefix_len"):
        fk._run_health_checks()


@pytest.mark.slow
def test_rebuild_cooldown(spark, tmp_path):
    """A threshold the workload structurally can't clear triggers ONE
    rebuild, not one per cadence: the second pass with the identical
    rebuild_args hits the no-improvement cooldown (round-6 ADVICE),
    and per-index health_opts carry the impossible threshold in."""
    import math

    def env(rs):
        df = spark.createDataFrame(rs, "vec_id long, emb array<double>")
        return df.select(
            F.struct(F.lit("emb").alias("topic"),
                     F.lit(0).cast("long").alias("partition"),
                     F.col("vec_id").cast("long").alias("offset")
                     ).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct("vec_id", "emb").alias("value"))

    from zync_spark.streaming import ann_index as AI

    rows = []
    for i in range(16):
        v = [0.0] * 4
        v[i % 4] = 1.0
        v[(i + 1) % 4] = 0.05 * (i % 3)
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    spec = AI.AnnIndexSpec("e", "value.vec_id", "value.emb",
                           n_cells=2, iterations=2)
    src.load(env(rows), "all")
    AI.sync_ann(src, dst, spec, ["emb"])

    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"emb": src}, sub, sub, format="json",
                   indexes=[(spec, dst, ["emb"])],
                   health_every=1, auto_rebuild=True,
                   health_opts={"e": {"min_recall": 1.01, "nprobe": 1,
                                      "sample": 8}})
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        fk._run_health_checks()
    n_after_first = len(dst.commits())
    assert fk._applied_rebuilds.get("e") == "{}"  # rebuild applied once
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        fk._run_health_checks()
    # cooldown: no second rebuild commit, and it says so
    assert len(dst.commits()) == n_after_first
    assert any("cooldown" in str(x.message) for x in w2)


def test_cli_index_pool(spark, tmp_path, capsys):
    """CLI surface: index-pool health (JSON verdict, exit 1 when
    unhealthy), fold, vacuum."""
    from zync_spark.cli import main

    spec = _spec()
    lake = str(tmp_path)
    src = Pool.create(spark, f"{lake}/src")
    dst = Pool.create(spark, f"{lake}/idx")
    src.load(_env(spark, _docs()), "all")
    DI.sync_index(src, dst, spec, ["docs"])
    DI.tombstone_index(dst, spec, [0, 3, 6, 9])

    assert main(["--lake", lake, "index-pool", "health", "idx",
                 "--max-masked-fraction", "0.05"]) == 1
    v = json.loads(capsys.readouterr().out.strip())
    assert v["family"] == "pool" and not v["healthy"]

    spec_yaml = os.path.join(lake, "spec.yaml")
    with open(spec_yaml, "w") as f:
        f.write("name: docs\nsource: src\ndest: idx\ntopics: [docs]\n"
                "id: value.doc_id\ntext: value.text\n"
                "k: 3\nnum_hashes: 32\nbands: 8\nthreshold: 0.5\n")
    assert main(["--lake", lake, "index-pool", "fold", "idx",
                 "--spec", spec_yaml]) == 0
    assert "folded" in capsys.readouterr().out
    assert main(["--lake", lake, "index-pool", "vacuum", "idx",
                 "--retention", "0"]) == 0
    assert "vacuumed" in capsys.readouterr().out
    assert main(["--lake", lake, "index-pool", "health", "idx"]) == 0
    v2 = json.loads(capsys.readouterr().out.strip())
    assert v2["healthy"] and v2["live_tombstones"] == 0
