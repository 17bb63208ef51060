"""Predicate → manifest-bounds pushdown (zync_spark/pushdown.py).

Extraction must be sound (const names are not columns, `or` stages and
post-transform filters contribute nothing, mixed types never raise) and
effective (a clustered pool's scan provably skips files; CLI query
results are bit-identical with and without pruning, including the
everything-pruned → empty-frame edge)."""

from __future__ import annotations

import json
import os

from zync_spark.cli import main
from zync_spark.pool import Pool
from zync_spark.pushdown import program_bounds


def test_extracts_from_named_pool():
    b = program_bounds(
        'from logs | kafka.offset > 5 and kafka.topic == "a" | cut kafka')
    assert b == {"logs": {"kafka.offset": (5, None), "kafka.topic": ("a", "a")}}


def test_where_form_and_flip_and_intersection():
    b = program_bounds("from t | where x >= 2 | 9 > x | yield {x:x}")
    assert b == {"t": {"x": (2, 9)}}


def test_implicit_single_input():
    b = program_bounds("value.n == 7 | cut value")
    assert b == {None: {"value.n": (7, 7)}}


def test_or_not_functions_contribute_nothing():
    assert program_bounds("from t | x > 5 or y > 2") == {}
    assert program_bounds("from t | not x > 5") == {}
    assert program_bounds("from t | len(s) > 5") == {}
    assert program_bounds("from t | x > y") == {}


def test_stops_at_first_non_filter_stage():
    # the filter AFTER a yield sees derived columns — must not leak
    b = program_bounds("from t | a > 1 | yield {a: a+1} | a > 100")
    assert b == {"t": {"a": (1, None)}}


def test_const_names_are_not_columns():
    # `const x = 10` then `x == 10` is constant folding, not a predicate
    assert program_bounds("const x = 10 x == 10 | cut a") == {}
    b = program_bounds("const x = 10 a == 3 and x == 10 | cut a")
    assert b == {}  # the conjunct chain includes a const → whole stage out


def test_from_block_per_leg():
    b = program_bounds(
        'from ( pool A => kafka.offset >= 3 | cut kafka '
        'pool B => value.n == 1 )')
    assert b == {"A": {"kafka.offset": (3, None)}, "B": {"value.n": (1, 1)}}


def test_garbage_never_raises():
    assert program_bounds("from ((((") == {}
    assert program_bounds("") == {}


ROW = ("kafka struct<topic:string,partition:long,offset:long>, "
       "zed_type string, value struct<n:long>")


def _lake_with_clustered_pool(spark, tmp_path):
    lake = os.path.join(str(tmp_path), "lake")
    pool = Pool.create(spark, os.path.join(lake, "logs"))
    for base in (0, 100, 200):
        rows = [(("t", 0, base + i), "data", (base + i,)) for i in range(50)]
        pool.load(spark.createDataFrame(rows, ROW), f"c{base}",
                  cluster_by=["kafka.offset"])
    return lake, pool


def test_scan_skips_files_by_extracted_bounds(spark, tmp_path):
    lake, pool = _lake_with_clustered_pool(spark, tmp_path)
    src = "from logs | kafka.offset >= 200 | cut kafka"
    bounds = program_bounds(src)["logs"]
    assert len(pool.committed_files(bounds=bounds)) < \
        len(pool.committed_files())


def test_cli_query_prunes_and_matches_unpruned(spark, tmp_path, capsys):
    lake, pool = _lake_with_clustered_pool(spark, tmp_path)
    argv = ["--lake", lake, "query", "--zed",
            "from logs | kafka.offset >= 120 and kafka.offset <= 205 "
            "| cut kafka.offset | sort kafka.offset"]
    assert main(argv) == 0
    got = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    # offsets exist in 0-49 / 100-149 / 200-249 (three commits)
    want = list(range(120, 150)) + list(range(200, 206))
    assert [r["kafka"]["offset"] for r in got] == want


def test_cli_query_everything_pruned_is_empty_not_error(spark, tmp_path, capsys):
    lake, _ = _lake_with_clustered_pool(spark, tmp_path)
    assert main(["--lake", lake, "query", "--zed",
                 "from logs | kafka.offset > 99999 | cut kafka"]) == 0
    assert capsys.readouterr().out.strip() == ""


def test_in_point_set_and_intersections():
    b = program_bounds('from t | kafka.topic in ["a", "b", "c"]')
    assert b == {"t": {"kafka.topic": ["a", "b", "c"]}}
    # set ∧ range and set ∧ set intersect
    b = program_bounds('from t | x in [1, 5, 9] and x >= 4 | where x in [5, 9, 12]')
    assert b == {"t": {"x": [5, 9]}}
    # empty intersection is a legal always-prune bound
    b = program_bounds('from t | x in [1] and x in [2]')
    assert b == {"t": {"x": []}}
    # malformed lists contribute nothing
    assert program_bounds("from t | x in [1,") == {}
    assert program_bounds("from t | x in y") == {}


def test_where_bounds_and_merge():
    from zync_spark.pushdown import merge_bounds, where_bounds

    assert where_bounds("value.n >= 3 and value.n < 9") == {"value.n": (3, 9)}
    assert where_bounds("len(s) > 2") == {}
    assert where_bounds("") == {}
    m = merge_bounds({"kafka.offset": (10, None)}, {"kafka.offset": (None, 50)})
    assert m == {"kafka.offset": (10, 50)}
    m = merge_bounds({"t": ("a", "a")}, {"t": ["a", "b"]})
    assert m == {"t": ["a"]}


def test_consume_prunes_by_topic_and_where(spark, tmp_path, capsys):
    lake = os.path.join(str(tmp_path), "lake")
    pool = Pool.create(spark, os.path.join(lake, "logs"))
    for topic, base in (("red", 0), ("blue", 100)):
        rows = [((topic, 0, base + i), "data", (base + i,)) for i in range(20)]
        pool.load(spark.createDataFrame(rows, ROW), topic,
                  cluster_by=["kafka.topic", "kafka.offset"])
    # file-level proof: topic+where bounds reach committed_files
    from zync_spark.pushdown import merge_bounds, where_bounds
    b = merge_bounds({"kafka.topic": ("blue", "blue"),
                      "kafka.offset": (0, None)},
                     where_bounds("value.n <= 105"))
    assert len(pool.committed_files(bounds=b)) < len(pool.committed_files())
    # end-to-end rows are unchanged by pruning
    assert main(["--lake", lake, "consume", "blue", "--pool", "logs",
                 "--where", "value.n <= 105"]) == 0
    got = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [r["value"]["n"] for r in got] == [100, 101, 102, 103, 104, 105]


def test_lower_bounds_from_extraction():
    from zync_spark.pushdown import lower_bounds_from

    assert lower_bounds_from(
        {"kafka.topic": ("a", "a"), "kafka.offset": (7, None)}) == {"a": 7}
    assert lower_bounds_from({"kafka.topic": ["a"]}) == {"a": 0}
    assert lower_bounds_from({"kafka.topic": ["a", "b"]}) is None
    assert lower_bounds_from({"kafka.topic": ("a", "b")}) is None
    assert lower_bounds_from({"kafka.offset": (7, None)}) is None
    assert lower_bounds_from(
        {"kafka.topic": ("a", "a"), "kafka.offset": [5, 9]}) == {"a": 5}


def test_commit_level_pruning_without_col_stats(spark, tmp_path, capsys):
    # plain loads (no cluster_by -> no per-file col_stats): a topic-pinned
    # program still prunes whole COMMITS via manifest per-topic stats
    from zync_spark.pushdown import lower_bounds_from, program_bounds

    lake = os.path.join(str(tmp_path), "lake")
    pool = Pool.create(spark, os.path.join(lake, "logs"))
    for topic, base in (("red", 0), ("blue", 100), ("red", 200)):
        rows = [((topic, 0, base + i), "data", (base + i,)) for i in range(30)]
        pool.load(spark.createDataFrame(rows, ROW), f"{topic}{base}")
    src = 'from logs | kafka.topic == "blue" and kafka.offset >= 100 | cut kafka'
    b = program_bounds(src)["logs"]
    lb = lower_bounds_from(b)
    assert lb == {"blue": 100}
    assert len(pool.committed_files(lb, bounds=b)) < len(pool.committed_files())
    assert main(["--lake", lake, "query", "--zed", src]) == 0
    got = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert sorted(r["kafka"]["offset"] for r in got) == list(range(100, 130))
