"""Zed PIPELINE compiler: the reference's user-facing query language
(`stage | stage | ...`) → a DataFrame plan.

The reference accepts arbitrary Zed programs in its shaper slots
(cli/shaper.go:8-22, applied per batch at fifo/lake.go:94-106 and
cmd/zync/from-kafka/command.go:276-282) and generates pipeline programs
itself (etl/build.go). `zedexpr.py` covers the *expression* subset; this
module adds the *operator* layer on top of the same tokenizer/parser, so a
reference user's shaper/pipeline text runs unchanged against Spark:

  where <expr>  /  bare <expr>        → df.filter          (etl/build.go:113)
  yield <expr>[, <expr>...]           → projection (+ fan-out union)
                                        (etl/build.go:171-177, README.md:78)
  cut f1, a.b, x:=<expr>              → nested keep-projection (design.md:342)
  put a.b:=<expr>, ...  / bare a:=e   → withColumn/withField (etl/build.go:176)
  drop f1, a.b                        → drop / dropFields
  rename new:=old                     → withColumnRenamed
  sort [-r] e1, e2                    → orderBy             (etl/build.go:107)
  head N / tail N                     → ordered limit       (fifo/lake.go:62-66)
  uniq                                → distinct (adjacent-dup semantics need
                                        sorted input, as with Unix uniq)
  [summarize] aggs [by keys]          → groupBy().agg()     (etl/pool.go:60-66,
                                        demo/update-etl.zed:16)
  fuse / pass                         → no-op (pools carry a unified schema;
                                        fuse is a union-schema concern only in
                                        the reference's per-value type model)
  switch ( case <e> => ... default => ... )
                                      → first-match filters + implicit union
                                        (etl/build.go:92-107)
  fork ( => ... => ... )              → every record down every branch,
                                        union (etl/build.go:129-138)

Every stage compiles to JVM Column expressions (whole-stage codegen);
nothing here drops to Python per row. At scale the plan is exactly what a
hand-written DataFrame program would be: filters push to the scan, aggs get
map-side partials, `sort|head N` collapses to Catalyst's TakeOrderedAndProject
(a top-k, never a global sort).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from zync_spark.zedexpr import (
    Context,
    Parser,
    Token,
    ZedSyntaxError,
    strip_const_prologue,
    tokenize,
)

# Zed aggregate functions (public zed docs; the subset the reference's
# generated programs and docs exercise, etl/pool.go:60-66, demo/etl.zed:12,
# design.md:262) plus the obvious completions.
_AGG_FUNCS = {
    "count": lambda a: F.count(F.lit(1)) if not a else F.count(a[0]),
    "sum": lambda a: F.sum(a[0]),
    "min": lambda a: F.min(a[0]),
    "max": lambda a: F.max(a[0]),
    "avg": lambda a: F.avg(a[0]),
    # collect preserves arrival order per group in the reference; orders are
    # partition-dependent in a distributed engine, so we expose the raw
    # collect_list — callers needing determinism sort upstream (the catalog
    # queries sort_array for oracle comparison).
    "collect": lambda a: F.collect_list(a[0]),
    # union() is zed's set-valued aggregate; emit a sorted array so the
    # result is deterministic under any partitioning.
    "union": lambda a: F.sort_array(F.collect_set(a[0])),
    "and": lambda a: F.bool_and(a[0]),
    "or": lambda a: F.bool_or(a[0]),
    "dcount": lambda a: F.approx_count_distinct(a[0]),
    "countdistinct": lambda a: F.count_distinct(a[0]),
}


@dataclass
class _Stage:
    toks: list[Token]


def _split_stages(toks: list[Token]) -> list[list[Token]]:
    """Split a token stream on top-level ``|`` stage separators.

    ``|`` is also the delimiter of zed map literals ``|{...}|``
    (demo/etl.zed:1-9). A ``|`` immediately followed by ``{`` opens a map
    literal; the first ``|`` after its matching ``}`` closes it. Depth
    tracking makes ``{a:1} | cut x`` (record then separator) unambiguous.
    """
    stages: list[list[Token]] = [[]]
    depth = 0
    map_close_at: list[int] = []  # brace depths with an open map literal
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "eof":
            break
        if t.kind == "op" and t.text == "|":
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if nxt is not None and nxt.kind == "op" and nxt.text == "{":
                # map-literal open: |{
                map_close_at.append(depth)
                stages[-1].append(t)
                i += 1
                continue
            if map_close_at and map_close_at[-1] == depth:
                # map-literal close
                map_close_at.pop()
                stages[-1].append(t)
                i += 1
                continue
            if depth == 0:
                stages.append([])
                i += 1
                continue
            stages[-1].append(t)
            i += 1
            continue
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            depth -= 1
        stages[-1].append(t)
        i += 1
    pos = toks[-1].pos if toks else 0
    return [s + [Token("eof", "", s[-1].pos if s else pos)] for s in stages if s]


def _has_toplevel(toks: list[Token], kind: str, text: str | None = None) -> bool:
    depth = 0
    for t in toks:
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            depth -= 1
        elif depth == 0 and t.kind == kind and (text is None or t.text == text):
            return True
    return False


@dataclass
class _State:
    df: DataFrame
    ctx: Context
    # the most recent explicit sort keys as (expr tokens replayable) Columns —
    # consulted by `tail N` to reverse deterministically.
    last_sort: list[Column] = field(default_factory=list)
    last_sort_desc: bool = False


def _fresh_ctx(df: DataFrame, ctx: Context) -> Context:
    """Stage contexts resolve against the CURRENT frame's schema (typeof,
    has/missing); user-declared const roots carry through."""
    return Context(roots=dict(ctx.roots), schema=df.schema)


def _expand_yield(df: DataFrame, col: Column, parser: Parser,
                  record_fields: list[str] | None) -> DataFrame:
    if record_fields is not None:
        # record literal: its fields become the output columns
        tmp = df.select(col.alias("_y"))
        return tmp.select(*[F.col("_y")[f].alias(f) for f in record_fields])
    return df.select(col)


class _StageParser(Parser):
    """Adds statement-level parses on top of the expression Parser."""

    def parse_record_literal_fields(self) -> tuple[Column, list[str]]:
        """Parse `{...}` capturing the field names (parse_record loses them
        inside the struct Column)."""
        self.expect("op", "{")
        fields: list[Column] = []
        names: list[str] = []
        if not self.accept("op", "}"):
            while True:
                nt = self.next()
                if not nt.text.isidentifier():
                    raise ZedSyntaxError(
                        f"expected field name, got {nt.text!r} at {nt.pos}")
                name = nt.text
                self.expect("op", ":")
                fields.append(self.parse_expr().alias(name))
                names.append(name)
                if self.accept("op", "}"):
                    break
                self.expect("op", ",")
        return F.struct(*fields), names

    def parse_assign_list(self) -> list[tuple[list[str], Column]]:
        out: list[tuple[list[str], Column]] = []
        while True:
            path = self._parse_path_only()
            self.expect("assign")
            out.append((path, self.parse_expr()))
            if not self.accept("op", ","):
                break
        return out

    def parse_path_list(self) -> list[list[str]]:
        out = [self._parse_path_only()]
        while self.accept("op", ","):
            out.append(self._parse_path_only())
        return out


def _apply_assign(df: DataFrame, path: list[str], col: Column) -> DataFrame:
    if len(path) == 1:
        return df.withColumn(path[0], col)
    top = path[0]
    return df.withColumn(top, F.col(top).withField(".".join(path[1:]), col))


def _apply_drop(df: DataFrame, path: list[str]) -> DataFrame:
    if len(path) == 1:
        return df.drop(path[0])
    top = path[0]
    return df.withColumn(top, F.col(top).dropFields(".".join(path[1:])))


def _cut_tree(items: list[tuple[list[str], Column | None]], ctx: Context):
    """Build the nested keep-projection: `cut a, b.c` keeps {a, b:{c}}
    (zed cut preserves nesting)."""
    tree: dict = {}
    for path, expr in items:
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ZedSyntaxError(f"cut: conflicting paths at {'.'.join(path)}")
        leaf = path[-1]
        node[leaf] = expr if expr is not None else ctx.resolve(path)
    def build(node: dict) -> list[Column]:
        cols = []
        for name, v in node.items():
            if isinstance(v, dict):
                cols.append(F.struct(*build(v)).alias(name))
            else:
                cols.append(v.alias(name))
        return cols
    return build(tree)


def _parse_agg_stage(p: _StageParser) -> tuple[list[Column], list[Column]]:
    """`[summarize] [name:=]agg(expr)[, ...] [by [name:=]expr[, ...]]`"""
    aggs: list[Column] = []
    while True:
        name = None
        t = p.next()
        # and()/or() are keyword tokens, not idents — match on text
        if t.kind not in ("ident", "and", "or"):
            raise ZedSyntaxError(f"expected aggregate, got {t.text!r} at {t.pos}")
        if p.peek().kind == "assign":
            name = t.text
            p.next()
            t = p.next()
            if t.kind not in ("ident", "and", "or"):
                raise ZedSyntaxError(
                    f"expected aggregate, got {t.text!r} at {t.pos}")
        fn = t.text
        if fn not in _AGG_FUNCS:
            raise ZedSyntaxError(f"unknown aggregate {fn!r} at {t.pos}")
        p.expect("op", "(")
        args: list[Column] = []
        if not p.accept("op", ")"):
            while True:
                args.append(p.parse_expr())
                if p.accept("op", ")"):
                    break
                p.expect("op", ",")
        col = _AGG_FUNCS[fn](args)
        aggs.append(col.alias(name or fn))
        if not p.accept("op", ","):
            break
    keys: list[Column] = []
    if p.peek().kind == "ident" and p.peek().text == "by":
        p.next()
        while True:
            name = None
            if (p.peek().kind in ("ident", "in")
                    and p.toks[p.i + 1].kind == "assign"):
                name = p.next().text
                p.next()
            start = p.i
            expr = p.parse_expr()
            if name is None:
                # default key name: the last path segment if the key is a
                # bare path, else a positional name
                seg = [t.text for t in p.toks[start:p.i] if t.kind == "ident"]
                name = seg[-1] if seg else f"key{len(keys)}"
            keys.append(expr.alias(name))
            if not p.accept("op", ","):
                break
    return aggs, keys


def _looks_like_agg(toks: list[Token]) -> bool:
    if toks and toks[0].kind == "ident" and toks[0].text == "summarize":
        return True
    if _has_toplevel(toks, "ident", "by"):
        # `by` mid-stage only occurs in aggregation stages
        return True
    # leading `agg(` or `name := agg(`
    j = 0
    if (len(toks) > 1 and toks[0].kind == "ident"
            and toks[1].kind == "assign"):
        j = 2
    return (len(toks) > j + 1 and toks[j].kind in ("ident", "and", "or")
            and toks[j].text in _AGG_FUNCS
            and toks[j + 1].kind == "op" and toks[j + 1].text == "(")


def _split_branches(toks: list[Token]) -> tuple[list[tuple[str, list[Token], list[Token]]], int]:
    """Parse the body of ``switch ( case <expr> => <stages> ... [default =>
    <stages>] )`` or ``fork ( => <stages> => <stages> )`` starting at the
    opening paren. Returns ([(kind, expr_toks, branch_toks)], consumed_len);
    kind is 'case', 'default', or 'fork'. ``=>`` arrives from the tokenizer
    as two ops (`=`, `>`)."""
    assert toks[0].kind == "op" and toks[0].text == "("
    i = 1
    branches: list[tuple[str, list[Token], list[Token]]] = []

    def at_arrow(j: int) -> bool:
        return (toks[j].kind == "op" and toks[j].text == "="
                and toks[j + 1].kind == "op" and toks[j + 1].text == ">")

    while i < len(toks):
        t = toks[i]
        if t.kind == "op" and t.text == ")":
            i += 1
            break
        if t.kind == "ident" and t.text in ("case", "default"):
            kind = t.text
            i += 1
            expr_toks: list[Token] = []
            if kind == "case":
                while not at_arrow(i):
                    expr_toks.append(toks[i])
                    i += 1
            i += 2  # consume =>
        elif at_arrow(i):
            kind, expr_toks = "fork", []
            i += 2
        else:
            raise ZedSyntaxError(
                f"expected case/default/=> in branch block, got {t.text!r} "
                f"at {t.pos}")
        body: list[Token] = []
        d = 0
        while i < len(toks):
            t = toks[i]
            if t.kind == "op" and t.text in "([{":
                d += 1
            elif t.kind == "op" and t.text in ")]}":
                if d == 0:
                    break  # the switch/fork closing paren
                d -= 1
            if d == 0 and t.kind == "ident" and t.text in ("case", "default"):
                break
            if d == 0 and at_arrow(i):
                break
            body.append(t)
            i += 1
        pos = body[-1].pos if body else t.pos
        branches.append((kind, expr_toks + [Token("eof", "", pos)],
                         body + [Token("eof", "", pos)]))
    return branches, i


def _apply_branch_block(st: _State, toks: list[Token], word: str) -> None:
    """switch: route each record to the FIRST matching case (declared-order
    exclusivity, etl/build.go:92-107) — or default; fork: send every record
    down every branch (etl/build.go:129-138). Branch outputs merge by
    implicit union (etl/build.go:107), null-padding differing schemas the
    way the reference's heterogeneous stream types do."""
    ctx = _fresh_ctx(st.df, st.ctx)
    branches, consumed = _split_branches(toks[1:])
    end = toks[1 + consumed]
    if end.kind != "eof":
        raise ZedSyntaxError(f"unexpected {end.text!r} after {word} block")
    outs: list[DataFrame] = []
    prior = None  # OR of earlier case predicates (first-match exclusivity)
    for kind, expr_toks, body in branches:
        if word == "switch":
            if kind == "fork":
                raise ZedSyntaxError("bare => branch belongs to fork, not switch")
            if kind == "case":
                pred = _StageParser(expr_toks, ctx).parse_expr()
                # null predicates are "no match" (zed truthiness), so fold
                # them to false before negating for later branches
                eff = pred if prior is None else pred & ~prior
                safe = F.coalesce(pred, F.lit(False))
                prior = safe if prior is None else prior | safe
                branch_df = st.df.filter(eff)
            else:  # default
                branch_df = st.df if prior is None else st.df.filter(~prior)
        else:
            if kind != "fork":
                raise ZedSyntaxError("case/default belongs to switch, not fork")
            branch_df = st.df
        sub = _State(df=branch_df, ctx=st.ctx)
        for stage in _split_stages(body):
            _apply_stage(sub, stage)
        outs.append(sub.df)
    out = outs[0]
    for other in outs[1:]:
        out = out.unionByName(other, allowMissingColumns=True)
    st.df = out
    st.last_sort = []


def compile_pipeline(df: DataFrame, src: str,
                     ctx: Context | None = None) -> DataFrame:
    """Compile a zed pipeline over one input frame.

    A `const` prologue (demo/etl.zed:1-9) binds names visible to every
    stage. Raises ZedSyntaxError on anything outside the supported surface —
    never a silent wrong answer.
    """
    base_ctx = ctx or Context()
    src = strip_const_prologue(src, base_ctx)
    stages = _split_stages(tokenize(src))
    st = _State(df=df, ctx=base_ctx)
    for toks in stages:
        _apply_stage(st, toks)
    return st.df


def _apply_stage(st: _State, toks: list[Token]) -> None:
    if not toks or toks[0].kind == "eof":
        return
    ctx = _fresh_ctx(st.df, st.ctx)
    p = _StageParser(toks, ctx)
    head = toks[0]
    word = head.text if head.kind == "ident" else None

    if word in ("fuse", "pass") and toks[1].kind == "eof":
        p.next()
        return
    if word == "uniq" and toks[1].kind == "eof":
        st.df = st.df.distinct()
        return
    if word == "where":
        p.next()
        st.df = st.df.filter(p.parse_expr())
        p.expect("eof")
        return
    if word == "yield":
        p.next()
        if toks[1].kind == "this" and toks[2].kind == "eof":
            return  # yield this = identity
        outs: list[DataFrame] = []
        while True:
            if p.peek().kind == "op" and p.peek().text == "{":
                col, names = p.parse_record_literal_fields()
                outs.append(_expand_yield(st.df, col, p, names))
            else:
                start = p.i
                expr = p.parse_expr()
                # struct-typed path → expand its fields (yield kafka)
                segs = [t.text for t in p.toks[start:p.i]]
                expanded = False
                if all(s.isidentifier() or s == "." for s in segs):
                    try:
                        dtype = ctx.resolve_type([s for s in segs if s != "."])
                        if isinstance(dtype, StructType):
                            tmp = st.df.select(expr.alias("_y"))
                            outs.append(tmp.select(
                                *[F.col("_y")[f.name].alias(f.name)
                                  for f in dtype.fields]))
                            expanded = True
                    except ZedSyntaxError:
                        pass
                if not expanded:
                    name = segs[-1] if segs and segs[-1].isidentifier() else "value"
                    outs.append(st.df.select(expr.alias(name)))
            if not p.accept("op", ","):
                break
        p.expect("eof")
        out = outs[0]
        for other in outs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        st.df = out
        st.last_sort = []
        return
    if word == "cut":
        p.next()
        items: list[tuple[list[str], Column | None]] = []
        while True:
            path = p._parse_path_only()
            if p.accept("assign"):
                items.append((path, p.parse_expr()))
            else:
                items.append((path, None))
            if not p.accept("op", ","):
                break
        p.expect("eof")
        st.df = st.df.select(*_cut_tree(items, ctx))
        return
    if word == "put":
        p.next()
        for path, col in p.parse_assign_list():
            st.df = _apply_assign(st.df, path, col)
        p.expect("eof")
        return
    if word == "drop":
        p.next()
        for path in p.parse_path_list():
            st.df = _apply_drop(st.df, path)
        p.expect("eof")
        return
    if word == "rename":
        p.next()
        while True:
            new = p._parse_path_only()
            p.expect("assign")
            old = p._parse_path_only()
            if len(new) != 1 or len(old) != 1:
                raise ZedSyntaxError(
                    "rename supports top-level fields (nested renames: use "
                    "put+drop)")
            st.df = st.df.withColumnRenamed(old[0], new[0])
            if not p.accept("op", ","):
                break
        p.expect("eof")
        return
    if word == "sort":
        p.next()
        desc = False
        if p.accept("op", "-"):
            flag = p.expect("ident")
            if flag.text != "r":
                raise ZedSyntaxError(f"unknown sort flag -{flag.text}")
            desc = True
        keys: list[Column] = []
        raw: list[Column] = []
        while True:
            e = p.parse_expr()
            raw.append(e)
            # zed sorts nulls last in both directions
            keys.append(e.desc_nulls_last() if desc else e.asc_nulls_last())
            if not p.accept("op", ","):
                break
        p.expect("eof")
        st.df = st.df.orderBy(*keys)
        st.last_sort = raw
        st.last_sort_desc = desc
        return
    if word in ("head", "tail"):
        p.next()
        t = p.peek()
        n = 1
        if t.kind == "int":
            p.next()
            n = int(t.text)
        p.expect("eof")
        if word == "head":
            st.df = st.df.limit(n)
            return
        if not st.last_sort:
            raise ZedSyntaxError(
                "tail requires a preceding sort: a distributed engine has no "
                "stable input order to take the last N of (the reference's "
                "tail rides the pool's offset order; sort kafka.offset first)")
        desc = not st.last_sort_desc
        rev = [e.desc_nulls_last() if desc else e.asc_nulls_last()
               for e in st.last_sort]
        fwd = [e.desc_nulls_last() if st.last_sort_desc else e.asc_nulls_last()
               for e in st.last_sort]
        st.df = st.df.orderBy(*rev).limit(n).orderBy(*fwd)
        return
    if word in ("switch", "fork") and len(toks) > 1 \
            and toks[1].kind == "op" and toks[1].text == "(":
        _apply_branch_block(st, toks, word)
        return
    if _looks_like_agg(toks):
        if word == "summarize":
            p.next()
        aggs, keys = _parse_agg_stage(p)
        p.expect("eof")
        if keys:
            st.df = st.df.groupBy(*keys).agg(*aggs)
        else:
            st.df = st.df.agg(*aggs)
        st.last_sort = []
        return
    # bare assignments (`a := e`) — the put-less form the ETL YAML uses
    if _has_toplevel(toks, "assign"):
        for path, col in p.parse_assign_list():
            st.df = _apply_assign(st.df, path, col)
        p.expect("eof")
        return
    # bare expression = filter (implicit where, etl/build.go:113-114).
    # Parse fully (eof) BEFORE applying: a trailing token means this wasn't
    # an expression stage at all, and that must surface as a syntax error,
    # not an analysis error about a half-parsed column.
    pred = p.parse_expr()
    p.expect("eof")
    st.df = st.df.filter(pred)


def compile_query(src: str, tables: dict[str, DataFrame],
                  ctx: Context | None = None) -> DataFrame:
    """Compile `[from NAME |] stage | ...` against a table namespace (the
    lake's pools, or any registered frames). Without a `from` head, the
    namespace must hold exactly one table."""
    base_ctx = ctx or Context()
    src = strip_const_prologue(src, base_ctx)
    toks = tokenize(src)
    stages = _split_stages(toks)
    if stages and stages[0] and stages[0][0].kind == "ident" \
            and stages[0][0].text == "from":
        name_toks = stages[0][1:-1]
        name = ".".join(t.text for t in name_toks)
        if name not in tables:
            raise ZedSyntaxError(f"unknown table {name!r} in from")
        df = tables[name]
        rest_stages = stages[1:]
    else:
        if len(tables) != 1:
            raise ZedSyntaxError("pipeline without `from` needs exactly one table")
        df = next(iter(tables.values()))
        rest_stages = stages
    st = _State(df=df, ctx=base_ctx)
    for s in rest_stages:
        _apply_stage(st, s)
    return st.df
