"""Differential ANSWER fuzz for the zed pipeline compiler (round 10,
VERDICT r9 ask #6): the existing fuzz tiers prove random programs fail
CONTROLLED (test_zedpipe_props) and that hand-picked compositions match
a pandas model — nothing at volume checked the compiler's ANSWERS
against an independent engine across the operator-composition matrix.

This harness generates seeded random pipelines from the implemented
stage grammar (where / put / cut / drop / rename / sort / head / tail /
uniq / agg-by) while CO-GENERATING the equivalent SQL, then runs the
zed program through compile_pipeline on Spark and the SQL through
DuckDB on the same parquet fixture and compares row bags exactly. The
SQL side is produced by independent per-stage templates (subquery
nesting), not by the compiler under test — a translation bug in
zedpipe cannot cancel out.

Determinism rules the generator enforces (so exact compare is sound):
- head/tail only ever follow a TOTAL sort (unique id as the tie key);
  elsewhere row order is ignored (bags compared sorted).
- uniq only follows `cut ... | sort <all kept columns>` — adjacent
  dedup on a fully sorted frame IS distinct.
- doubles are exact halves (k/2) so sums are order-independent exact;
  long arithmetic is exact everywhere; avg is excluded (DuckDB
  accumulates it in floating point, Spark divides once).

400 seeded programs; slow tier. A failure prints the zed program, the
SQL, and the first differing rows.
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest

from zync_spark.zedpipe import compile_pipeline

N_PROGRAMS = 400
SEED = 20260816

ROWS = [
    (
        i,
        "abcd"[i % 4],
        (i * 7) % 10,
        ((i * 3) % 11) / 2.0,
        "abcd"[(i * 5 + 1) % 4],
    )
    for i in range(40)
]
SCHEMA = "id long, g string, n long, x double, h string"
COLS = {"id": "long", "g": "string", "n": "long",
        "x": "double", "h": "string"}

_NUM_OPS = ["==", "!=", "<", "<=", ">", ">="]


class _Gen:
    """One random pipeline: zed stage list + matching SQL built by
    wrapping the previous SQL in a subquery per stage."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.cols = dict(COLS)
        self.zed: list[str] = []
        self.sql = "SELECT * FROM t0"
        self.fresh = 0

    def _numcols(self):
        return [c for c, t in self.cols.items() if t in ("long", "double")]

    def _wrap(self, select: str, suffix: str = ""):
        self.sql = f"SELECT {select} FROM ({self.sql}) {suffix}"

    def stage_where(self):
        rng = self.rng
        if rng.random() < 0.3 and any(t == "string"
                                      for t in self.cols.values()):
            col = rng.choice([c for c, t in self.cols.items()
                              if t == "string"])
            lit = rng.choice("abcd")
            op = rng.choice(["==", "!="])
            self.zed.append(f'where {col} {op} "{lit}"')
            sop = "=" if op == "==" else "<>"
            self._wrap("*", f"WHERE {col} {sop} '{lit}'")
            return
        col = rng.choice(self._numcols())
        op = rng.choice(_NUM_OPS)
        lit = rng.randint(0, 9)
        self.zed.append(f"where {col} {op} {lit}")
        sop = {"==": "=", "!=": "<>"}.get(op, op)
        self._wrap("*", f"WHERE {col} {sop} {lit}")

    def stage_put(self):
        rng = self.rng
        name = f"y{self.fresh}"
        self.fresh += 1
        if rng.random() < 0.3 and any(t == "string"
                                      for t in self.cols.values()):
            col = rng.choice([c for c, t in self.cols.items()
                              if t == "string"])
            self.zed.append(f"put {name} := to_upper({col})")
            self._wrap(f"*, upper({col}) AS {name}")
            self.cols[name] = "string"
            return
        col = rng.choice([c for c, t in self.cols.items() if t == "long"]
                         or self._numcols())
        a, b = rng.randint(1, 5), rng.randint(0, 9)
        self.zed.append(f"put {name} := {col} * {a} + {b}")
        self._wrap(f"*, {col} * {a} + {b} AS {name}")
        self.cols[name] = self.cols[col]

    def stage_cut(self):
        keep = self.rng.sample(sorted(self.cols),
                               self.rng.randint(2, len(self.cols)))
        if "id" not in keep:
            keep[0] = "id"  # id survives so later sorts stay total
        keep = list(dict.fromkeys(keep))
        self.zed.append("cut " + ", ".join(keep))
        self._wrap(", ".join(keep))
        self.cols = {c: self.cols[c] for c in keep}

    def stage_drop(self):
        victims = [c for c in self.cols if c != "id"]
        if len(victims) < 2:
            return self.stage_put()
        col = self.rng.choice(victims)
        self.zed.append(f"drop {col}")
        keep = [c for c in self.cols if c != col]
        self._wrap(", ".join(keep))
        del self.cols[col]

    def stage_rename(self):
        victims = [c for c in self.cols if c != "id"]
        if not victims:
            return self.stage_put()
        old = self.rng.choice(victims)
        new = f"r{self.fresh}"
        self.fresh += 1
        self.zed.append(f"rename {new} := {old}")
        sel = ", ".join(f"{c} AS {new}" if c == old else c
                        for c in self.cols)
        self._wrap(sel)
        self.cols = {(new if c == old else c): t
                     for c, t in self.cols.items()}

    def stage_sort_head(self):
        rng = self.rng
        col = rng.choice(sorted(self.cols))
        desc = rng.random() < 0.5
        k = rng.randint(1, 8)
        verb = rng.choice(["head", "tail"])
        flag = "-r " if desc else ""
        self.zed.append(f"sort {flag}{col}, id | {verb} {k}")
        # zed `sort -r` reverses EVERY key, and `tail k` is the last k
        # of the sorted frame = first k under the fully reversed order
        d = "DESC" if desc else "ASC"
        if verb == "tail":
            d = "ASC" if desc else "DESC"
        self._wrap("*", f"ORDER BY {col} {d}, id {d} LIMIT {k}")

    def stage_uniq(self):
        keep = self.rng.sample([c for c in self.cols if c != "id"],
                               min(2, max(1, len(self.cols) - 1)))
        keep = list(dict.fromkeys(keep))
        self.zed.append("cut " + ", ".join(keep)
                        + " | sort " + ", ".join(keep) + " | uniq")
        self._wrap("DISTINCT " + ", ".join(keep))
        self.cols = {c: self.cols[c] for c in keep}

    def stage_agg(self):
        rng = self.rng
        num = [c for c, t in self.cols.items() if t in ("long", "double")]
        keys = rng.sample(sorted(self.cols), rng.randint(1, 2))
        aggs, sqls = [], []
        for i in range(rng.randint(1, 3)):
            fn = rng.choice(["sum", "count", "min", "max"])
            name = f"a{i}"
            if fn == "count":
                aggs.append(f"{name} := count()")
                sqls.append(f"count(*) AS {name}")
            else:
                col = rng.choice(num) if num else "id"
                aggs.append(f"{name} := {fn}({col})")
                sqls.append(f"{fn}({col}) AS {name}")
        self.zed.append(", ".join(aggs) + " by " + ", ".join(keys))
        self._wrap(", ".join(keys + sqls),
                   f"GROUP BY {', '.join(keys)}")
        self.cols = {k: self.cols[k] for k in keys}  # terminal anyway

    def build(self):
        n = self.rng.randint(1, 4)
        row_stages = [self.stage_where, self.stage_put, self.stage_cut,
                      self.stage_drop, self.stage_rename,
                      self.stage_sort_head]
        for _ in range(n):
            self.rng.choice(row_stages)()
        r = self.rng.random()
        if r < 0.25:
            self.stage_agg()
        elif r < 0.4:
            self.stage_uniq()
        return " | ".join(self.zed), self.sql


def _norm(v):
    if isinstance(v, Decimal):
        f = float(v)
        return int(v) if f == int(f) else f
    if isinstance(v, float) and v == int(v):
        return int(v)
    return v


def _bag(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


@pytest.mark.slow
def test_zed_pipeline_differential_fuzz(spark, tmp_path):
    import duckdb

    df = spark.createDataFrame(ROWS, SCHEMA)
    fixture = str(tmp_path / "t0.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(fixture)
    base = spark.read.parquet(fixture)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t0 AS SELECT * FROM '{fixture}/*.parquet'")
    rng = random.Random(SEED)
    ran = 0
    for i in range(N_PROGRAMS):
        g = _Gen(random.Random(rng.randrange(2**63)))
        prog, sql = g.build()
        got = _bag(tuple(r) for r in compile_pipeline(base, prog).collect())
        want = _bag(con.sql(sql).fetchall())
        assert got == want, (
            f"program #{i}\n  zed: {prog}\n  sql: {sql}\n"
            f"  spark({len(got)}): {got[:5]}\n  duck({len(want)}): {want[:5]}")
        ran += 1
    assert ran == N_PROGRAMS
