"""Differential ANSWER fuzz for the zed pipeline compiler (round 10,
VERDICT r9 ask #6; round 11 extends the grammar to the relational core
per VERDICT r10 ask #4): the existing fuzz tiers prove random programs
fail CONTROLLED (test_zedpipe_props) and that hand-picked compositions
match a pandas model — nothing at volume checked the compiler's ANSWERS
against an independent engine across the operator-composition matrix.

This harness generates seeded random pipelines from the implemented
stage grammar (where / put / cut / drop / rename / sort / head / tail /
uniq / agg-by, and — round 11 — switch / fork / fuse / pass plus
two-input `from(pool..pool..)|join` programs with anti/left/inner
types, dotted struct join keys, and right-scope graft clauses) while
CO-GENERATING the equivalent SQL, then runs the zed program through
compile_pipeline / compile_query on Spark and the SQL through DuckDB on
the same parquet fixtures and compares row bags exactly. The SQL side
is produced by independent per-stage templates (subquery nesting;
joins as EXISTS/JOIN over aliased subqueries; switch as
cumulative-negation UNION ALL legs — first-match exclusivity is
asserted by construction), not by the compiler under test — a
translation bug in zedpipe cannot cancel out.

Determinism rules the generator enforces (so exact compare is sound):
- head/tail only ever follow a TOTAL sort (unique id as the tie key);
  after a fork the id is no longer unique, so forked pipelines never
  draw sort|head again.
- uniq only follows `cut ... | sort <all kept columns>` — adjacent
  dedup on a fully sorted frame IS distinct.
- doubles are exact halves (k/2) so sums are order-independent exact;
  long arithmetic is exact everywhere; avg is excluded (DuckDB
  accumulates it in floating point, Spark divides once).
- join outputs `cut` away struct columns (DuckDB renders structs as
  dicts; scalar columns compare exactly).

>= 400 seeded programs; slow tier. A failure prints the zed program,
the SQL, and the first differing rows.
"""

from __future__ import annotations

import random
from decimal import Decimal

import pytest

from zync_spark.zedpipe import compile_pipeline, compile_query

N_PROGRAMS = 440
N_JOIN = 160  # of which: two-input join programs
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

# join fixtures: left carries a struct for dotted keys; the right's
# struct is named `rs` so the SQL alias `r` never collides with it
J0_ROWS = [(i, "abcd"[i % 4], (i * 7) % 10, ((i * 11) % 6, "mnop"[i % 4]))
           for i in range(30)]
J0_SCHEMA = "id long, g string, n long, s struct<k:long, m:string>"
J0_COLS = {"id": "long", "g": "string", "n": "long", "s": "struct"}
J1_ROWS = [(i, (i * 5) % 6, (i * 3) % 9, ((i * 7) % 6, i % 5))
           for i in range(20)]
J1_SCHEMA = "rid long, k long, w long, rs struct<k:long, u:long>"

_NUM_OPS = ["==", "!=", "<", "<=", ">", ">="]


def _sop(op: str) -> str:
    return {"==": "=", "!=": "<>"}.get(op, op)


class _Gen:
    """One random pipeline: zed stage list + matching SQL built by
    wrapping the previous SQL in a subquery per stage."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.cols = dict(COLS)
        self.zed: list[str] = []
        self.sql = "SELECT * FROM t0"
        self.fresh = 0
        self.forked = False  # id no longer unique -> no later sort|head

    def _numcols(self):
        return [c for c, t in self.cols.items() if t in ("long", "double")]

    def _wrap(self, select: str, suffix: str = ""):
        self.sql = f"SELECT {select} FROM ({self.sql}) {suffix}"

    def _num_pred(self):
        """(zed predicate, sql predicate) over a numeric column."""
        col = self.rng.choice(self._numcols())
        op = self.rng.choice(_NUM_OPS)
        lit = self.rng.randint(0, 9)
        return f"{col} {op} {lit}", f"{col} {_sop(op)} {lit}"

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
        zp, sp = self._num_pred()
        self.zed.append(f"where {zp}")
        self._wrap("*", f"WHERE {sp}")

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
        if self.forked:  # id no longer a unique tie key -> order not total
            return self.stage_where()
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

    def stage_fuse(self):
        # fuse/pass are schema-level no-ops on a unified-schema frame —
        # the SQL side deliberately does NOT change, so any compiler
        # drift here (a dropped row, a reordered column) fails the bag
        self.zed.append(self.rng.choice(["fuse", "pass"]))

    def stage_switch(self):
        """switch with DELIBERATELY overlapping case predicates: the SQL
        side encodes first-match exclusivity as cumulative negation
        (case2 leg = NOT p1 AND p2), so a compiler that routes a record
        down more than one case — or the wrong one — fails the bag."""
        rng = self.rng
        name = f"t{self.fresh}"
        self.fresh += 1
        (p1z, p1s), (p2z, p2s) = self._num_pred(), self._num_pred()
        with_default = rng.random() < 0.7
        cols = ", ".join(self.cols)
        zed = (f'switch ( case {p1z} => put {name} := "one" '
               f'case {p2z} => put {name} := "two" ')
        prev = self.sql
        legs = [
            f"SELECT {cols}, 'one' AS {name} FROM ({prev}) WHERE {p1s}",
            f"SELECT {cols}, 'two' AS {name} FROM ({prev}) "
            f"WHERE NOT ({p1s}) AND {p2s}",
        ]
        if with_default:
            zed += f'default => put {name} := "dflt" '
            legs.append(
                f"SELECT {cols}, 'dflt' AS {name} FROM ({prev}) "
                f"WHERE NOT ({p1s}) AND NOT ({p2s})")
        self.zed.append(zed + ")")
        self.sql = " UNION ALL ".join(legs)
        self.cols[name] = "string"

    def stage_fork(self):
        """fork: every record down BOTH branches, implicit union — the
        SQL side is a plain UNION ALL of two derived legs."""
        rng = self.rng
        name = f"f{self.fresh}"
        self.fresh += 1
        col = rng.choice([c for c, t in self.cols.items()
                          if t == "long"] or ["id"])
        a1, b1 = rng.randint(1, 5), rng.randint(0, 9)
        a2, b2 = rng.randint(1, 5), rng.randint(0, 9)
        self.zed.append(
            f"fork ( => put {name} := {col} * {a1} + {b1} "
            f"=> put {name} := {col} * {a2} + {b2} )")
        cols = ", ".join(self.cols)
        prev = self.sql
        self.sql = (
            f"SELECT {cols}, {col} * {a1} + {b1} AS {name} FROM ({prev}) "
            f"UNION ALL "
            f"SELECT {cols}, {col} * {a2} + {b2} AS {name} FROM ({prev})")
        self.cols[name] = "long"
        self.forked = True

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
                      self.stage_sort_head, self.stage_fuse]
        branch_stages = [self.stage_switch, self.stage_fork]
        for _ in range(n):
            if self.rng.random() < 0.3:
                self.rng.choice(branch_stages)()
            else:
                self.rng.choice(row_stages)()
        r = self.rng.random()
        if r < 0.25:
            self.stage_agg()
        elif r < 0.4:
            self.stage_uniq()
        return " | ".join(self.zed), self.sql


class _GenJoin:
    """One random two-input program: per-leg stages inside a
    `from ( pool t0 => ... pool t1 => ... )` block feeding an
    anti/left/inner join, with dotted struct keys and right-scope graft
    clauses. The SQL side aliases the two independently generated leg
    subqueries and re-expresses anti as NOT EXISTS — no shared
    translation machinery with the compiler under test."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    def _left_leg(self):
        """(zed stage text, sql subquery, surviving cols) — keeps id and
        the struct column s (a dotted key may need it)."""
        rng = self.rng
        zed, sql, cols = "pass", "SELECT * FROM j0", dict(J0_COLS)
        if rng.random() < 0.5:
            op = rng.choice(_NUM_OPS)
            lit = rng.randint(0, 9)
            zed = f"where n {op} {lit}"
            sql = f"SELECT * FROM j0 WHERE n {_sop(op)} {lit}"
        if rng.random() < 0.4:
            drop = rng.choice(["g", "n"])
            keep = [c for c in cols if c != drop]
            zed = (zed + " | " if zed != "pass" else "") + \
                "cut " + ", ".join(keep)
            sql = f"SELECT {', '.join(keep)} FROM ({sql})"
            cols = {c: cols[c] for c in keep}
        return zed, sql, cols

    def _right_leg(self):
        rng = self.rng
        zed, sql = "pass", "SELECT * FROM j1"
        if rng.random() < 0.5:
            op = rng.choice(_NUM_OPS)
            lit = rng.randint(0, 8)
            zed = f"where w {op} {lit}"
            sql = f"SELECT * FROM j1 WHERE w {_sop(op)} {lit}"
        return zed, sql

    def build(self):
        rng = self.rng
        lzed, lsql, lcols = self._left_leg()
        rzed, rsql = self._right_leg()
        jtype = rng.choice(["anti", "inner", "left"])
        lk = rng.choice(["id", "n", "s.k"] if "n" in lcols
                        else ["id", "s.k"])
        rk = rng.choice(["rid", "k", "w", "rs.k"])
        # qualified SQL spellings (DuckDB resolves alias.col.field as a
        # struct extract)
        lk_sql = f"l.{lk}"
        rk_sql = f"r.{rk}"
        zed = (f"from ( pool t0 => {lzed}  pool t1 => {rzed} ) "
               f"| {jtype} join on {lk}={rk}")
        out_cols = [c for c, t in lcols.items() if t != "struct"]
        if jtype == "anti":
            sql = (f"SELECT {', '.join(out_cols)} FROM ({lsql}) l "
                   f"WHERE NOT EXISTS (SELECT 1 FROM ({rsql}) r "
                   f"WHERE {lk_sql} = {rk_sql})")
        else:
            grafts, gsql = [], []
            for i in range(rng.randint(1, 2)):
                name = f"g{i}"
                expr = rng.choice([
                    ("rid * 2", "r.rid * 2"),
                    ("k + 100", "r.k + 100"),
                    ("w", "r.w"),
                    ("rs.k", "r.rs.k"),
                    ("rs.u + 1", "r.rs.u + 1"),
                ])
                grafts.append(f"{name} := {expr[0]}")
                gsql.append(f"{expr[1]} AS {name}")
                out_cols.append(name)
            zed += " " + ", ".join(grafts)
            kw = "JOIN" if jtype == "inner" else "LEFT JOIN"
            lsel = ", ".join(
                f"l.{c}" for c, t in lcols.items() if t != "struct")
            sql = (f"SELECT {lsel}, {', '.join(gsql)} FROM ({lsql}) l "
                   f"{kw} ({rsql}) r ON {lk_sql} = {rk_sql}")
        # structs don't compare across engines -> cut them away on both
        # sides (on the SQL side they were never selected)
        zed += " | cut " + ", ".join(out_cols)
        return zed, sql


def _norm(v):
    if isinstance(v, Decimal):
        f = float(v)
        return int(v) if f == int(f) else f
    if isinstance(v, float) and v == int(v):
        return int(v)
    return v


def _bag(rows):
    return sorted(
        tuple(_norm(v) for v in r) for r in rows)


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


@pytest.mark.slow
def test_zed_join_differential_fuzz(spark, tmp_path):
    """Two-input relational core (round-11 ask #4): anti/left/inner
    joins over from-block legs, dotted struct keys, right-scope grafts —
    each program's SQL co-generated independently (EXISTS / JOIN over
    aliased subqueries)."""
    import duckdb

    f0 = str(tmp_path / "j0.parquet")
    f1 = str(tmp_path / "j1.parquet")
    d0 = spark.createDataFrame(J0_ROWS, J0_SCHEMA)
    d1 = spark.createDataFrame(J1_ROWS, J1_SCHEMA)
    d0.coalesce(1).write.mode("overwrite").parquet(f0)
    d1.coalesce(1).write.mode("overwrite").parquet(f1)
    t0 = spark.read.parquet(f0)
    t1 = spark.read.parquet(f1)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW j0 AS SELECT * FROM '{f0}/*.parquet'")
    con.sql(f"CREATE VIEW j1 AS SELECT * FROM '{f1}/*.parquet'")
    rng = random.Random(SEED + 1)
    ran = 0
    for i in range(N_JOIN):
        g = _GenJoin(random.Random(rng.randrange(2**63)))
        prog, sql = g.build()
        out = compile_query(prog, {"t0": t0, "t1": t1})
        got = _bag(tuple(r) for r in out.collect())
        want = _bag(con.sql(sql).fetchall())
        assert got == want, (
            f"program #{i}\n  zed: {prog}\n  sql: {sql}\n"
            f"  spark({len(got)}): {got[:5]}\n  duck({len(want)}): {want[:5]}")
        ran += 1
    assert ran == N_JOIN
