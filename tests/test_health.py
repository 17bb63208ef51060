"""Index health policy (streaming/health.py): each family's check flags
its real degradation mode, the recommendation names the rebuild that
cures it, and running that rebuild restores the pinned gate."""

import json
import math

import pytest
from pyspark.sql import functions as F

from zync_spark.pool import Pool
from zync_spark.streaming import ann_index as AI
from zync_spark.streaming import dedup_index as DI
from zync_spark.streaming import span_index as SI
from zync_spark.streaming import text_index as TI
from zync_spark.streaming.health import (check_ann_health,
                                         check_dedup_health,
                                         check_span_health,
                                         check_text_health)


def _env(spark, rows, part=0, topic="docs",
         schema="doc_id long, text string", fields=("doc_id", "text")):
    df = spark.createDataFrame(rows, schema)
    return df.select(
        F.struct(F.lit(topic).alias("topic"),
                 F.lit(part).cast("long").alias("partition"),
                 F.col(fields[0]).cast("long").alias("offset")
                 ).alias("kafka"),
        F.lit("data").alias("zed_type"),
        F.struct(*fields).alias("value"))


@pytest.mark.slow
def test_ann_health_lifecycle(spark, tmp_path):
    """A quantizer frozen on two clusters splits a LATER third cluster
    (vectors straddling the two centroid directions) across both cells —
    nprobe=1 recall collapses to ~0.5. Health flags it; the recommended
    rebuild_ann retrains, gives the straddle region its own cell, and
    recall returns above the gate."""
    import math

    def vec(axis, i, dim=8):
        # unit vector near `axis` with a small deterministic wobble in
        # the next dimension — clusters are tight and well separated
        v = [0.0] * dim
        w = 0.05 * ((i % 5) - 2)
        v[axis] = math.sqrt(1 - w * w)
        v[(axis + 3) % dim] = w
        return v

    rows = []
    # backfill: clusters around e0 and e1 (ids 0..15) — trains 2 cells
    for i in range(8):
        rows.append((i, vec(0, i)))
        rows.append((8 + i, vec(1, i)))
    # drift: a third cluster straddling e0/e1 — alternating tiny lean
    # toward e0 or e1 decides which frozen cell each lands in
    straddle = []
    for i in range(24):
        lean = 0.08 if i % 2 == 0 else -0.08
        a = 1 / math.sqrt(2)
        v = [0.0] * 8
        v[0], v[1] = a + lean, a - lean
        n = math.sqrt(sum(x * x for x in v))
        straddle.append((100 + i, [x / n for x in v]))
    rows_all = rows + straddle

    def env(rs, part=0):
        df = spark.createDataFrame(rs, "vec_id long, embedding array<double>")
        return df.select(
            F.struct(F.lit("emb").alias("topic"),
                     F.lit(part).cast("long").alias("partition"),
                     F.col("vec_id").cast("long").alias("offset")
                     ).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct("vec_id", "embedding").alias("value"))

    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    spec = AI.AnnIndexSpec("e", "value.vec_id", "value.embedding",
                           n_cells=2, iterations=2)
    src.load(env(rows), "backfill")
    AI.sync_ann(src, dst, spec, ["emb"])
    src.load(env(straddle, part=1), "drift")
    AI.sync_ann(src, dst, spec, ["emb"])
    AI.compact_ann(dst)

    h = check_ann_health(dst, spec, k=10, nprobe=1, sample=64,
                         min_recall=0.8)
    assert not h["healthy"], h
    assert "rebuild_ann" in h["recommendation"]
    assert h["avg_recall"] < 0.8

    # the recommended cure: retrain over everything stored, more cells
    AI.rebuild_ann(dst, spec, n_cells=3)
    h2 = check_ann_health(dst, spec, k=10, nprobe=1, sample=64,
                          min_recall=0.8)
    assert h2["healthy"], h2
    assert h2["avg_recall"] > h["avg_recall"]
    assert h2["recommendation"] is None


def test_span_health_lifecycle(spark, tmp_path):
    """prefix_len=1 (16 buckets) saturates under document-sized deltas;
    health projects the coverage, recommends a prefix_len from the
    sizing rule, and the rebuild restores the gate."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(60)))
            for i in range(6)]
    spec = SI.SpanIndexSpec("s", "value.doc_id", "value.text",
                            window=8, min_docs=2, prefix_len=1)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, rows), "all")
    SI.sync_spans(src, dst, spec, ["docs"])

    h = check_span_health(dst, spec, max_coverage=0.5)
    assert not h["healthy"], h
    assert h["projected_probe_coverage"] > 0.5
    assert "rebuild_spans" in h["recommendation"]
    rec_plen = int(h["recommendation"].split("prefix_len=")[1].split(")")[0])
    spec2 = SI.rebuild_spans(dst, spec, prefix_len=rec_plen)
    h2 = check_span_health(dst, spec2, max_coverage=0.5)
    assert h2["healthy"], h2
    assert h2["projected_probe_coverage"] < h["projected_probe_coverage"]


def test_text_health_lifecycle(spark, tmp_path):
    """Terms-per-bucket read amplification: 16 buckets over ~300 terms
    fails a 10-terms-per-bucket gate; the recommended rebuild passes."""
    rows = [(i, " ".join(f"t{i}q{j}" for j in range(50)))
            for i in range(6)]
    spec = TI.TextIndexSpec("d", "value.doc_id", "value.text",
                            prefix_len=1)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, rows), "all")
    TI.sync_text(src, dst, spec, ["docs"])

    h = check_text_health(dst, spec, max_terms_per_bucket=10.0)
    assert not h["healthy"], h
    assert "rebuild_text" in h["recommendation"]
    rec_plen = int(h["recommendation"].split("prefix_len=")[1].split(")")[0])
    spec2 = TI.rebuild_text(dst, spec, prefix_len=rec_plen)
    h2 = check_text_health(dst, spec2, max_terms_per_bucket=10.0)
    assert h2["healthy"], h2
    assert h2["terms_per_bucket"] < h["terms_per_bucket"]


def test_dedup_health_flags_saturation_and_collisions(spark, tmp_path):
    """Probe saturation flags with a rebuild recommendation; a heavily
    duplicated corpus raises the collision advisory instead (which
    honestly says banding changes need a source re-ingest)."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away tonight")
    # heavily duplicated corpus: every doc near-identical
    rows = [(i, base + f" v{i}") for i in range(12)]
    spec = DI.DedupIndexSpec("d", "value.doc_id", "value.text",
                             prefix_len=1)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, rows), "all")
    DI.sync_index(src, dst, spec, ["docs"])

    # 12 docs x 16 bands = 192 band rows vs 16 buckets: saturated
    h = check_dedup_health(dst, spec, max_coverage=0.5)
    assert not h["healthy"], h
    assert "rebuild_index" in h["recommendation"]
    rec_plen = int(h["recommendation"].split("prefix_len=")[1].split(")")[0])
    spec2 = DI.rebuild_index(dst, spec, prefix_len=rec_plen)
    h2 = check_dedup_health(dst, spec2, max_coverage=0.5)
    assert h2["projected_probe_coverage"] < h["projected_probe_coverage"]
    # near-identical docs collide in almost every band: the collision
    # advisory fires once saturation is cured
    h3 = check_dedup_health(dst, spec2, max_coverage=1.0,
                            max_collision_rate=0.2)
    assert not h3["healthy"] and "re-ingest" in h3["recommendation"]
    assert h3["collision_rate"] > 0.2


def test_cli_health_verbs(spark, tmp_path, capsys):
    """`*-index health` prints one JSON verdict."""
    import os

    import yaml as _yaml

    from zync_spark.cli import main

    lake = os.path.join(tmp_path, "lake")
    src = Pool.create(spark, os.path.join(lake, "src"))
    rows = [(i, " ".join(f"c{i}w{j}" for j in range(30)))
            for i in range(5)]
    src.load(_env(spark, rows), "all")
    sspec = os.path.join(tmp_path, "s.yaml")
    with open(sspec, "w") as f:
        _yaml.safe_dump(
            {"kind": "span", "name": "d", "source": "src", "dest": "sidx",
             "topics": ["docs"], "id": "value.doc_id",
             "text": "value.text", "window": 8, "prefix_len": 1}, f)
    assert main(["--lake", lake, "span-index", "sync", sspec]) == 0
    capsys.readouterr()
    assert main(["--lake", lake, "span-index", "health", sspec]) == 0
    v = json.loads(capsys.readouterr().out.strip())
    assert v["family"] == "span" and not v["healthy"]
    assert "rebuild_spans" in v["recommendation"]


def test_fromkafka_health_cadence_auto_rebuild(spark, tmp_path):
    """The streaming maintenance loop's health cadence: an unhealthy
    verdict warns with the JSON verdict, and auto_rebuild applies the
    structured recommendation AND swaps the rebuilt spec into the index
    entry so later syncs validate against the new contract."""
    import warnings

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from zync_spark.streaming.from_kafka import FromKafka

    rows = [(i, " ".join(f"k{i}w{j}" for j in range(60)))
            for i in range(6)]
    spec = SI.SpanIndexSpec("s", "value.doc_id", "value.text",
                            window=8, min_docs=2, prefix_len=1)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, rows), "all")
    SI.sync_spans(src, dst, spec, ["docs"])

    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"docs": src}, sub, sub, format="json",
                   indexes=[(spec, dst, ["docs"])],
                   health_every=2, auto_rebuild=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        verdicts = fk._run_health_checks()
    fam = [v for v in verdicts if v["family"] == "span"]
    assert len(fam) == 1 and not fam[0]["healthy"]
    # round 7: the retention pass appends one pool verdict per dest pool
    assert [v["family"] for v in verdicts].count("pool") == 1
    assert any("unhealthy" in str(x.message) for x in w)
    # the rebuilt spec replaced the entry — new prefix_len, new contract
    new_spec = fk.indexes[0][0]
    assert new_spec.prefix_len == fam[0]["rebuild_args"]["prefix_len"]
    assert new_spec.prefix_len > 1
    # second pass: healthy, no rebuild, spec unchanged
    v2 = [v for v in fk._run_health_checks() if v["family"] == "span"]
    assert v2[0]["healthy"] and fk.indexes[0][0] is new_spec
    # and the rebuilt index still answers (spans_view under new spec)
    SI.spans_view(dst, new_spec).count()


def test_fromkafka_health_no_auto_rebuild_warns_only(spark, tmp_path):
    import warnings

    from pyspark.sql.types import LongType, StructField, StructType

    from zync_spark.streaming.from_kafka import FromKafka

    rows = [(i, " ".join(f"m{i}w{j}" for j in range(60)))
            for i in range(6)]
    spec = SI.SpanIndexSpec("s", "value.doc_id", "value.text",
                            window=8, min_docs=2, prefix_len=1)
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    src.load(_env(spark, rows), "all")
    SI.sync_spans(src, dst, spec, ["docs"])
    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"docs": src}, sub, sub, format="json",
                   indexes=[(spec, dst, ["docs"])], health_every=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        verdicts = fk._run_health_checks()
    fam = [v for v in verdicts if v["family"] == "span"]
    assert not fam[0]["healthy"]
    assert any("unhealthy" in str(x.message) for x in w)
    assert fk.indexes[0][0] is spec  # warn-only: nothing rebuilt


# -- round 10: occupancy/skew policy (shared by the two vector families) ----


def test_occupancy_policy_verdicts():
    """_occupancy_policy's two gates fire independently (SCALING §18.5):
    mean past threshold = uniform fattening; max/mean past max_balance
    with max above threshold = a collapsed quantizer's catch-all cell —
    the case a mean-only policy is blind to (B2: mean 333 at target,
    max 7,951). Both cures carry spread init + scaled iterations; the
    cap case is flagged instead of steering into a no-op rebuild loop."""
    from zync_spark.streaming.health import _CELL_CAP, _occupancy_policy

    # the B2 residual shape: mean healthy, one catch-all cell
    p = _occupancy_policy(110_000, 333.0, 7_951, 1024.0, 8.0, 2)
    assert p["mean_ok"] and not p["skew_ok"]
    assert p["args"]["init"] == "sample"
    assert p["args"]["iterations"] >= math.ceil(
        math.log2(p["args"]["n_cells"]))
    # uniform fattening: mean breaches, balance fine
    p2 = _occupancy_policy(110_000, 3125.0, 3500, 1024.0, 8.0, 2)
    assert not p2["mean_ok"] and p2["skew_ok"]
    assert p2["rec_cells"] >= math.ceil(math.sqrt(110_000))
    # a skewed but SMALL max is not a failure (max under the threshold:
    # even a 20x balance costs nothing if the fat cell is tiny)
    p3 = _occupancy_policy(1_000, 10.0, 200, 1024.0, 8.0, 2)
    assert p3["mean_ok"] and p3["skew_ok"]
    # cell-label cap: rec_cells clamps and the capped flag says the
    # rebuild cannot clear the mean gate (round-9 ADVICE)
    p4 = _occupancy_policy(400_000_000, 6_000.0, 7_000, 1024.0, 8.0, 2)
    assert p4["rec_cells"] == _CELL_CAP and p4["capped"]


@pytest.mark.slow
def test_embdedup_skew_gate_and_rebuild_report(spark, tmp_path):
    """The skew gate fires when mean occupancy is AT target but one cell
    hoards the corpus, the recommended rebuild carries the quantizer-
    geometry cure (spread init + scaled iterations), and rebuild's
    stats_out reports the post-rebuild balance so a useless rebuild is
    visible immediately (round-10 ask #1)."""
    from zync_spark.streaming import embdedup_index as ED
    from zync_spark.streaming.health import check_embdedup_health

    def vec(i):
        # 30 of 36 vectors in one tight mode, 6 spread out: the modulo
        # init's averaged centroids collapse and the argmin funnels the
        # big mode into one cell
        if i < 30:
            return [1.0, 0.001 * i, 0.0, 0.0]
        return [0.0, 0.0, math.cos(i), math.sin(i)]

    rows = [(("emb", 0, i), "data", (i, vec(i))) for i in range(36)]
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    src.load(spark.createDataFrame(
        rows, "kafka struct<topic:string,partition:long,offset:long>, "
        "zed_type string, value struct<vec_id:long,emb:array<double>>"),
        "all")
    spec = ED.EmbDedupIndexSpec("v", "value.vec_id", "value.emb",
                                n_cells=6, iterations=2, threshold=0.99)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0

    v = check_embdedup_health(dest, spec, max_mean_occupancy=20.0,
                              max_balance=2.0)
    # mean is 36/cells_used (<= 20), but the fat cell breaches both the
    # threshold and the balance gate
    assert v["max_cell_occupancy"] >= 30
    assert not v["healthy"]
    assert v["rebuild_args"]["init"] == "sample"
    assert v["rebuild_args"]["iterations"] >= 2
    assert "balance" in v["recommendation"]

    so = {}
    ED.rebuild_embdedup(dest, spec, stats_out=so, **v["rebuild_args"])
    # the report is the ask: post-rebuild occupancy, immediately
    assert {"cells_used", "max_cell_occupancy", "mean_cell_occupancy",
            "cell_balance"} <= set(so)
    # spread seeding separated the modes: the fat cell shrank (the big
    # mode is genuinely one mode — it keeps its own cell — but the six
    # outliers no longer share it)
    assert so["max_cell_occupancy"] <= v["max_cell_occupancy"]
    assert so["cells_used"] >= 2


@pytest.mark.slow
def test_ann_occupancy_lifecycle(spark, tmp_path):
    """Round-10 ask #3: the ANN family gets the same occupancy policy as
    embdedup — threshold verdict with structured rebuild_args, applied
    end-to-end by FromKafka's auto_rebuild loop, after which the index
    is healthy and still answers queries."""
    from pyspark.sql.types import LongType, StructField, StructType

    from zync_spark.streaming.from_kafka import FromKafka

    def env(rs, part=0):
        df = spark.createDataFrame(rs, "vec_id long, embedding array<double>")
        return df.select(
            F.struct(F.lit("emb").alias("topic"),
                     F.lit(part).cast("long").alias("partition"),
                     F.col("vec_id").cast("long").alias("offset")
                     ).alias("kafka"),
            F.lit("data").alias("zed_type"),
            F.struct("vec_id", "embedding").alias("value"))

    import math as m
    rows = [(i, [m.sin(0.7 * i + j) + 0.01 * ((i * 31 + j * 17) % 19)
                 for j in range(6)]) for i in range(48)]
    src = Pool.create(spark, str(tmp_path / "src"))
    dst = Pool.create(spark, str(tmp_path / "idx"))
    spec = AI.AnnIndexSpec("e", "value.vec_id", "value.embedding",
                           n_cells=2, iterations=2)
    src.load(env(rows), "backfill")
    AI.sync_ann(src, dst, spec, ["emb"])

    v = check_ann_health(dst, spec, k=5, nprobe=1, sample=8,
                         min_recall=0.0, max_mean_occupancy=8.0)
    assert not v["healthy"]
    assert v["mean_cell_occupancy"] > 8.0
    assert {"max_cell_occupancy", "cell_balance"} <= set(v)
    assert v["rebuild_args"]["n_cells"] >= 7  # >= ceil(sqrt(48))
    assert v["rebuild_args"]["init"] == "sample"

    sub = StructType([StructField("x", LongType())])
    fk = FromKafka(spark, {"emb": src}, sub, sub, format="json",
                   indexes=[(spec, dst, ["emb"])], health_every=1,
                   auto_rebuild=True,
                   health_opts={"e": {"min_recall": 0.0,
                                      "max_mean_occupancy": 8.0,
                                      "sample": 8}})
    with pytest.warns(UserWarning, match="unhealthy"):
        fk._run_health_checks()
    v2 = check_ann_health(dst, spec, k=5, nprobe=1, sample=8,
                          min_recall=0.0, max_mean_occupancy=8.0)
    assert v2["healthy"] and v2["cells_used"] > 2
    # the loop recorded the post-rebuild outcome for the cooldown
    assert fk._occ_results.get("e") is not None
    # the rebuilt index still answers (stored centroids adapted)
    qs = spark.createDataFrame(rows[:3], "vec_id long, embedding array<double>")
    assert AI.ann_query(dst, spec, qs, k=3, nprobe=2).count() > 0


@pytest.mark.slow
def test_fromkafka_occupancy_cooldown(spark, tmp_path):
    """The round-10 cooldown: when the LAST applied occupancy rebuild
    left max occupancy at X and a new verdict reports max <= 1.25X, the
    loop refuses to re-fire (rec_cells drifting with N made the
    arg-identity cooldown useless — §18.5's repeated no-op rebuilds)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from zync_spark.streaming import embdedup_index as ED
    from zync_spark.streaming.from_kafka import FromKafka

    def vec(i):
        # 30 IDENTICAL vectors: every quantizer — spread init included —
        # puts them in ONE cell, so no rebuild can cure the balance
        if i < 30:
            return [1.0, 0.0, 0.0, 0.0]
        return [0.0, 0.0, math.cos(i), math.sin(i)]

    rows = [(("emb", 0, i), "data", (i, vec(i))) for i in range(36)]
    src = Pool.create(spark, str(tmp_path / "src"))
    dest = Pool.create(spark, str(tmp_path / "idx"))
    src.load(spark.createDataFrame(
        rows, "kafka struct<topic:string,partition:long,offset:long>, "
        "zed_type string, value struct<vec_id:long,emb:array<double>>"),
        "all")
    spec = ED.EmbDedupIndexSpec("v", "value.vec_id", "value.emb",
                                n_cells=6, iterations=2, threshold=0.99)
    assert ED.sync_embdedup(src, dest, spec, ["emb"]) > 0

    sub = StructType([StructField("x", LongType())])
    # max_balance=1.05: NO quantizer can clear it on this corpus — the
    # structurally-uncurable workload the cooldown exists for
    fk = FromKafka(spark, {"emb": src}, sub, sub, format="json",
                   indexes=[(spec, dest, ["emb"])], health_every=1,
                   auto_rebuild=True,
                   health_opts={"v": {"max_mean_occupancy": 20.0,
                                      "max_balance": 1.05}})
    with pytest.warns(UserWarning):
        fk._run_health_checks()  # applies one rebuild, records outcome
    assert fk._occ_results.get("v") is not None
    n_commits = len(dest.commits())
    with pytest.warns(UserWarning, match="cooldown"):
        fk._run_health_checks()  # still unhealthy → suppressed
    assert len(dest.commits()) == n_commits  # no second O(corpus) rebuild
    # mean-breach RE-ARM (round-10 ADVICE): a later MEAN-occupancy
    # failure — uniform fattening, simulated here by tightening the
    # gate — is a DIFFERENT failure a resize WOULD cure, so the skew
    # cooldown must not suppress it even though max occupancy is
    # inside the 1.25x band
    fk.health_opts["v"]["max_mean_occupancy"] = 1.0
    with pytest.warns(UserWarning, match="unhealthy"):
        fk._run_health_checks()
    assert len(dest.commits()) > n_commits  # the rebuild fired
