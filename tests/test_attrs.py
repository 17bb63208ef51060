"""Spec-agnostic index-resident attrs (streaming/attrs.py, round 8).

Round 7 built metadata co-location for the text family only; round 8
lifts it to ONE shared implementation any spec uses. Invariants:
(1) an ANN-only index resolves retrieval filters from its own pool —
no source scan; (2) latest version per id wins under upsert CDC;
(3) tombstoned ids are masked; (4) the coverage guard fails LOUD when
live indexed ids predate the spec's attrs; (5) attrs survive
rebuild_ann; (6) the CLI's ANN-only `retrieve --where` resolves
index-resident."""

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming import ann_index as AI
from zync_spark.streaming import embdedup_index as ED

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, "
       "value struct<vec_id:long,emb:array<double>,lang:string>")

DIM = 6


def _vec(i):
    return [math.sin(0.7 * i + j) + 0.01 * ((i * 31 + j * 17) % 19)
            for j in range(DIM)]


def _lang(i):
    return "en" if i % 3 else "de"


def _load(spark, src, lo, hi, lang=None, part=0):
    rows = [(("emb", part, i), "data", (i, _vec(i), lang or _lang(i)))
            for i in range(lo, hi)]
    src.load(spark.createDataFrame(rows, ROW), f"[{lo},{hi})")


SPEC = AI.AnnIndexSpec("v", "value.vec_id", "value.emb",
                       n_cells=4, iterations=2,
                       attrs={"lang": "value.lang"})


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_ann_attr_ids_resolves_without_source(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    got = AI.attr_ids(dest, SPEC, "lang = 'en'")
    # the filter plan never touches the source pool
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert str(tmp_path / "src") not in plan
    assert _ids(got) == [i for i in range(30) if _lang(i) == "en"]
    # filtered query answers == source-level filter semantics
    qs = spark.createDataFrame([(0, _vec(0))],
                               "vec_id long, emb array<double>")
    res = AI.ann_query(dest, SPEC, qs, id_col="vec_id", vec_col="emb",
                       k=5, nprobe=SPEC.n_cells, where_ids=got).collect()
    assert res and all(_lang(r["neighbor_id"]) == "en" for r in res)


def test_attr_latest_version_wins_and_tombstones_mask(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 24)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    # upsert: republish id 6 (was 'en') as 'de' — the superseded attr
    # row must never admit it again
    src.load(spark.createDataFrame(
        [(("emb", 0, 24), "data", (6, _vec(6), "de"))], ROW), "cdc")
    assert AI.sync_ann(src, dest, SPEC, ["emb"], upsert=True) > 0
    en = _ids(AI.attr_ids(dest, SPEC, "lang = 'en'"))
    assert 6 not in en
    assert 6 in _ids(AI.attr_ids(dest, SPEC, "lang = 'de'"))
    # tombstone: a deleted id matches no predicate at all
    AI.tombstone_ann(dest, SPEC, [8])
    assert 8 not in _ids(AI.attr_ids(dest, SPEC, "lang = 'en'"))
    assert 8 not in _ids(AI.attr_ids(dest, SPEC, "lang = 'de'"))


def test_coverage_guard_fails_loud_on_preattr_docs(spark, tmp_path):
    """An index synced BEFORE the spec declared attrs must refuse
    attr-filtered retrieval (silently excluding the pre-attrs docs is
    the round-7 failure mode the guard exists for)."""
    bare = AI.AnnIndexSpec("v", "value.vec_id", "value.emb",
                           n_cells=4, iterations=2)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 20)
    assert AI.sync_ann(src, dest, bare, ["emb"]) > 0
    from zync_spark.streaming.health import EmptyIndexError

    with pytest.raises(EmptyIndexError):
        AI.attr_ids(dest, bare, "lang = 'en'")  # spec declares none
    # the spec grows attrs, one later sync covers only the NEW docs
    _load(spark, src, 20, 26)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    with pytest.raises(ValueError, match="predates"):
        AI.attr_ids(dest, SPEC, "lang = 'en'")


def test_attrs_survive_rebuild_ann(spark, tmp_path):
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    before = _ids(AI.attr_ids(dest, SPEC, "lang = 'en'"))
    assert AI.rebuild_ann(dest, SPEC, target_rows=64) > 0
    assert _ids(AI.attr_ids(dest, SPEC, "lang = 'en'")) == before


def test_embdedup_attr_ids(spark, tmp_path):
    spec = ED.EmbDedupIndexSpec("v", "value.vec_id", "value.emb",
                                n_cells=4, iterations=2, threshold=0.6,
                                attrs={"lang": "value.lang"})
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    got = _ids(ED.attr_ids(dest, spec, "lang = 'en'"))
    assert got == [i for i in range(30) if _lang(i) == "en"]


def test_attrs_commit_before_quantizer_trains_ann(spark, tmp_path):
    """A delta consumed BEFORE the quantizer trains (all-null-vector
    bootstrap) advances cursors permanently — its attr rows must commit
    with that advance, or the docs are excluded from attr-filtered
    retrieval for the index's life (round-8 ADVICE, medium)."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    src.load(spark.createDataFrame(
        [(("emb", 0, i), "data", (i, None, _lang(i))) for i in range(6)],
        ROW), "null-vec bootstrap")
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0  # attrs, no vecs
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) == 0  # cursors advanced
    _load(spark, src, 6, 30)
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0  # trains now
    en = _ids(AI.attr_ids(dest, SPEC, "lang = 'en'"))
    assert [i for i in en if i < 6] == [i for i in range(6) if
                                        _lang(i) == "en"]


def test_attrs_commit_before_quantizer_trains_embdedup(spark, tmp_path):
    spec = ED.EmbDedupIndexSpec("v", "value.vec_id", "value.emb",
                                n_cells=4, iterations=2, threshold=0.6,
                                attrs={"lang": "value.lang"})
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    src.load(spark.createDataFrame(
        [(("emb", 0, i), "data", (i, None, _lang(i))) for i in range(6)],
        ROW), "null-vec bootstrap")
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) == 0
    _load(spark, src, 6, 30)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    en = _ids(ED.attr_ids(dest, spec, "lang = 'en'"))
    assert [i for i in en if i < 6] == [i for i in range(6) if
                                        _lang(i) == "en"]


def test_attr_rows_collapse_within_pass(spark, tmp_path):
    """Two versions of one id in a single NON-upsert delta: the higher
    source offset's attrs win deterministically (stored offsets carry no
    version order — round-8 ADVICE)."""
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    src.load(spark.createDataFrame(
        [(("emb", 0, 0), "data", (5, _vec(5), "en")),
         (("emb", 0, 1), "data", (5, _vec(5), "de")),
         (("emb", 0, 2), "data", (7, _vec(7), "en"))], ROW), "dup-id")
    assert AI.sync_ann(src, dest, SPEC, ["emb"]) > 0
    assert _ids(AI.attr_ids(dest, SPEC, "lang = 'de'")) == [5]
    assert _ids(AI.attr_ids(dest, SPEC, "lang = 'en'")) == [7]


def test_cli_ann_only_retrieve_where(spark, tmp_path, capsys):
    """A text-less deployment: `retrieve ann.yaml --where` resolves the
    filter from the ANN pool's own attrs (round-8 ask #3) and prints
    top-k cosine neighbors directly."""
    import yaml as _yaml

    from zync_spark.cli import main

    lake = os.path.join(tmp_path, "lake_ann")
    asrc = Pool.create(spark, os.path.join(lake, "asrc"))
    rows = [(("emb", 0, i), "data", (i, _vec(i), _lang(i)))
            for i in range(24)]
    asrc.load(spark.createDataFrame(rows, ROW), "backfill")
    aspec = os.path.join(tmp_path, "aidx.yaml")
    with open(aspec, "w") as f:
        _yaml.safe_dump(
            {"name": "emb", "source": "asrc", "dest": "aidx",
             "topics": ["emb"], "id": "value.vec_id", "vec": "value.emb",
             "n_cells": 4, "attrs": {"lang": "value.lang"}}, f)
    assert main(["--lake", lake, "ann-index", "sync", aspec]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "retrieve", aspec, "--vec-id", "3",
                 "-k", "5", "--nprobe", "4",
                 "--where", "lang = 'en'", "--explain"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in lines if not l.startswith("#")]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows and all(_lang(r["doc_id"]) == "en" for r in rows)
    assert all(r["doc_id"] != 3 for r in rows)  # self excluded
    assert any("resolved from index-attrs(ann)" in l for l in lines)
    # a bad predicate over the ANN attr path surfaces the friendly
    # error, not a raw AnalysisException traceback (round-8 ADVICE)
    with pytest.raises(SystemExit, match="bad --where predicate"):
        main(["--lake", lake, "retrieve", aspec, "--vec-id", "3",
              "--where", "nosuchcol = 'x'"])
    # --query without a text spec is refused loudly
    with pytest.raises(SystemExit, match="text-index spec"):
        main(["--lake", lake, "retrieve", aspec, "--vec-id", "3",
              "--query", "spark"])
    # hybrid mode without --query is refused loudly
    tspec = os.path.join(tmp_path, "tidx.yaml")
    with open(tspec, "w") as f:
        _yaml.safe_dump(
            {"kind": "text", "name": "d", "source": "asrc",
             "dest": "tidx", "topics": ["docs"], "id": "value.vec_id",
             "text": "value.lang"}, f)
    with pytest.raises(SystemExit, match="requires --query"):
        main(["--lake", lake, "retrieve", tspec, aspec, "--vec-id", "3"])
