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
  from NAME / from ( pool A => ...    → table/pool scans; a multi-source
       pool B => ... )                  block unions its legs and feeds a
                                        following join (demo/update.zed:1-5,
                                        design.md:347-352)
  [anti|left|inner] join on lk=rk     → hash equi-join over the two from-
       [f:=<right expr>, ...]           block legs; graft clauses evaluate
                                        in the right record's scope
                                        (demo/update.zed:6, pending.zed:5)
  top N e1, e2                        → TakeOrderedAndProject top-k (desc)
  grep "pat" [<expr>]                 → substring search (all string
                                        columns when no expr)
  over <expr>                         → array traversal (explode; struct
                                        elements expand to records)
  is(<T>)                             → named-type predicate on the
                                        zed_type discriminator (update.zed:3)
  e1 e2 (space-separated predicates)  → AND (zed search syntax,
                                        pending.zed:4)
  collect(x) after sort k             → order-preserving collect: per-group
                                        sort_array over (k, x) pairs
                                        (design.md:262's seqno-sorted
                                        bundles, partition-independent)
  type NAME = {...} prologue          → declared named types; cast(x, NAME)
                                        coerces and tags — a top-level
                                        yield expands it to columns + the
                                        zed_type discriminator
                                        (ztests/etl-zed.yaml:10, :71)
  fork ( => ... => ... ) | join ...   → a two-branch fork feeds the join
                                        as its legs — the generated
                                        denorm idiom (etl/build.go:198-216,
                                        ztests/etl-zed.yaml:27-31)

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
    _TaggedRecord,
    ensure_column,
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
    # zed any(): "one value from the group", unspecified which. min() is a
    # deterministic refinement — same answer under every partitioning
    # (F.first would be partition-order-dependent).
    "any": lambda a: F.min(a[0]),
    "collect_map": lambda a: _collect_map(a[0]),
}


def _collect_map(m: Column) -> Column:
    """zed collect_map(): merge the group's map values into one map. Key
    conflicts are unspecified in zed; here the MAX value per key wins —
    a deterministic refinement (entries are sorted (key, value) and the
    last entry per key is kept), safe under any partitioning and immune
    to spark.sql.mapKeyDedupPolicy (keys are unique before
    map_from_entries)."""
    entries = F.array_sort(F.flatten(F.collect_list(F.map_entries(m))))
    keep = F.filter(
        entries,
        lambda e, i: (i == F.size(entries) - 1)
        | (e["key"] != F.element_at(entries, i + 2)["key"]),
    )
    return F.map_from_entries(keep)


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
    df: DataFrame | None
    ctx: Context
    # table namespace for `from` / `from ( pool ... )` stages (the lake's
    # pools, or any registered frames); None in pure-shaper pipelines.
    tables: dict[str, DataFrame] | None = None
    # the two legs of the most recent multi-source `from` block, consumed
    # by a following `join` stage (demo/update.zed:6, demo/pending.zed:5).
    legs: list[DataFrame] | None = None
    # the most recent explicit sort keys as TOKEN slices, recompiled in the
    # consuming stage's context — consulted by `tail N` (deterministic
    # reverse) and by order-preserving collect() (the reference's collect
    # sees the merged sort order of the pool scan; a distributed engine
    # must re-establish it per group, so collect after sort compiles to a
    # sort_array over the captured keys).
    last_sort_toks: list[list[Token]] = field(default_factory=list)
    last_sort_desc: bool = False
    # the frame as it was BEFORE the most recent sort stage — non-None only
    # while sort is the latest stage applied. Consumers whose output order
    # is undefined anyway (join legs, multi-leg unions) take this frame, so
    # a `sort` that only exists to feed an ordered collect/tail never
    # materializes a global range-partition sort.
    pre_sort_df: DataFrame | None = None


def _sort_keys_resolvable(st: _State, ctx: Context,
                          df: DataFrame | None = None) -> bool:
    """True when every captured sort key still compiles AND resolves in the
    current frame. A stage between the sort and the consumer may have
    projected the key away (`sort x | cut y | collect(y) by k`); ordered
    collect then degrades to plain collect (round-1 semantics) instead of
    an unresolvable-column analysis error. Resolution is checked by
    recompiling the captured tokens and running them through Spark's eager
    analysis (df.select) — a head-identifier heuristic would misjudge
    expression keys like `sort lower(name)` (whose first identifier is the
    function name) and silently drop the declared order."""
    try:
        cols = _sort_key_cols(st, ctx)
        if df is not None:
            df.select(*cols)
        return True
    except Exception:
        return False


def _sort_key_cols(st: _State, ctx: Context) -> list[Column]:
    """Recompile the captured sort-key token slices against `ctx` (the
    consuming stage's frame may differ from the one that sorted)."""
    cols: list[Column] = []
    for kt in st.last_sort_toks:
        pos = kt[-1].pos if kt else 0
        p = _StageParser(kt + [Token("eof", "", pos)], ctx)
        cols.append(p.parse_expr())
        p.expect("eof")
    return cols


def _fresh_ctx(df: DataFrame, ctx: Context) -> Context:
    """Stage contexts resolve against the CURRENT frame's schema (typeof,
    has/missing); user-declared const roots carry through. path_names and
    names_sink are SHARED (same objects): decorations read/written in any
    stage belong to the one pipeline-level registry."""
    return Context(roots=dict(ctx.roots), schema=df.schema,
                   named_types=dict(ctx.named_types),
                   path_names=ctx.path_names, names_sink=ctx.names_sink)


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
                # value position: named-type casts keep the coerced value
                # in the struct; the TAG survives as a path decoration in
                # the compile-level registry (names_sink) — consumable by
                # typeof(path), the pool types.json sidecar, and the
                # connectjson wire schema
                self._fstack.append(name)
                v = self.parse_expr()
                if isinstance(v, _TaggedRecord):
                    self.ctx.names_sink[".".join(self._fstack)] = v.name
                    v = v.col
                self._fstack.pop()
                fields.append(ensure_column(v, "field value").alias(name))
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
            # value position: named-type casts keep the shape; the tag
            # decorates the target path in the registry. The TARGET path
            # seeds the field stack so tags nested inside a record
            # literal on the right decorate their ABSOLUTE path
            # (a := {b: cast(..., T)} → 'a.b', not 'b').
            self._fstack.extend(path)
            v = self.parse_expr()
            del self._fstack[len(self._fstack) - len(path):]
            if isinstance(v, _TaggedRecord):
                self.ctx.names_sink[".".join(path)] = v.name
                v = v.col
            out.append((path, ensure_column(v, "assigned value")))
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


def _parse_agg_stage(
    p: _StageParser,
    ordered: tuple[list[Column], bool] | None = None,
) -> tuple[list[Column], list[Column]]:
    """`[summarize] [name:=]agg(expr)[, ...] [by [name:=]expr[, ...]]`

    `ordered` carries the upstream sort (keys, desc) when one is declared:
    the reference's collect() sees records in the merged sort order of the
    scan (design.md:262 collects seqno-sorted transaction bundles), so
    collect after an explicit sort compiles to sort_array over (sort keys,
    value) pairs — per-group deterministic regardless of partitioning."""
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
                args.append(ensure_column(p.parse_expr(), "aggregate argument"))
                if p.accept("op", ")"):
                    break
                p.expect("op", ",")
        if fn != "count" and not args:
            raise ZedSyntaxError(f"{fn}() needs an argument at {t.pos}")
        # `agg(e) where <pred>` — zed's per-aggregate filter clause: only
        # rows satisfying the predicate contribute to THIS aggregate.
        # Compiles to a when(pred, arg) wrap: every aggregate here skips
        # nulls, so the filtered semantics come for free inside the same
        # partial-aggregation plan (no extra pass, no shuffle change).
        if p.peek().kind == "ident" and p.peek().text == "where":
            p.next()
            wpred = ensure_column(p.parse_expr(), "aggregate filter")
            if args:
                args = [F.when(wpred, args[0])] + args[1:]
            else:  # count() where pred -> count of non-null when()
                args = [F.when(wpred, F.lit(1))]
        if fn == "collect" and ordered is not None and args:
            okeys, odesc = ordered
            pair = F.struct(
                *[k.alias(f"_k{i}") for i, k in enumerate(okeys)],
                args[0].alias("_v"))
            col = F.transform(
                F.sort_array(F.collect_list(pair), asc=not odesc),
                lambda s: s["_v"])
        else:
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
            expr = ensure_column(p.parse_expr(), "group key")
            if name is None:
                # default key name: the last path segment if the key is a
                # bare path, else a positional name; every(d) buckets the
                # conventional `ts` field and keeps its name (zed sugar)
                seg = [t.text for t in p.toks[start:p.i] if t.kind == "ident"]
                if seg and seg[0] == "every":
                    name = "ts"
                else:
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
        return (j + 1 < len(toks)
                and toks[j].kind == "op" and toks[j].text == "="
                and toks[j + 1].kind == "op" and toks[j + 1].text == ">")

    while i < len(toks):
        t = toks[i]
        if t.kind == "eof":
            raise ZedSyntaxError("unterminated switch/fork block")
        if t.kind == "op" and t.text == ")":
            i += 1
            break
        if t.kind == "ident" and t.text in ("case", "default"):
            kind = t.text
            i += 1
            expr_toks: list[Token] = []
            if kind == "case":
                while not at_arrow(i):
                    if toks[i].kind == "eof":
                        raise ZedSyntaxError(
                            "unterminated case expression in switch block")
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


def _is_join_stage(toks: list[Token] | None) -> bool:
    if not toks or toks[0].kind != "ident":
        return False
    if toks[0].text == "join":
        return True
    return (toks[0].text in ("anti", "left", "inner") and len(toks) > 1
            and toks[1].kind == "ident" and toks[1].text == "join")


def _apply_branch_block(st: _State, toks: list[Token], word: str,
                        nxt: list[Token] | None = None,
                        subject: Column | None = None) -> None:
    """switch: route each record to the FIRST matching case (declared-order
    exclusivity, etl/build.go:92-107) — or default; fork: send every record
    down every branch (etl/build.go:129-138). Branch outputs merge by
    implicit union (etl/build.go:107), null-padding differing schemas the
    way the reference's heterogeneous stream types do. A fork over no
    input frame is legal when every branch opens with its own `from`
    (demo/pending.zed); switch always needs an input.

    A two-branch fork immediately followed by a `join` stage exposes its
    branches as the join's legs — the reference's denorm idiom
    (etl/build.go:198-216, ztests/etl-zed.yaml:27-31: per-side yield+sort
    branches merged by `join on l=r right:=right`). Branch-final sorts
    are elided from the legs in that case (a hash join neither needs nor
    preserves input order)."""
    if st.df is None and word == "switch":
        raise ZedSyntaxError("switch needs an input frame (add a `from`)")
    ctx = _fresh_ctx(st.df, st.ctx) if st.df is not None else st.ctx
    branches, consumed = _split_branches(toks[1:])
    if 1 + consumed >= len(toks):
        raise ZedSyntaxError(f"unterminated {word} block")
    end = toks[1 + consumed]
    if end.kind != "eof":
        raise ZedSyntaxError(f"unexpected {end.text!r} after {word} block")
    outs: list[DataFrame] = []
    pres: list[DataFrame | None] = []
    prior = None  # OR of earlier case predicates (first-match exclusivity)
    for kind, expr_toks, body in branches:
        if word == "switch":
            if kind == "fork":
                raise ZedSyntaxError("bare => branch belongs to fork, not switch")
            if kind == "case":
                pred = ensure_column(
                    _StageParser(expr_toks, ctx).parse_expr(), "predicate")
                if subject is not None:
                    # value form: case expressions are VALUES compared
                    # against the subject
                    pred = subject == pred
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
        sub = _State(df=branch_df, ctx=st.ctx, tables=st.tables)
        bstages = _split_stages(body)
        for bi, stage in enumerate(bstages):
            _apply_stage(sub, stage,
                         bstages[bi + 1] if bi + 1 < len(bstages) else None)
        outs.append(sub.df)
        pres.append(sub.pre_sort_df)
    if word == "fork" and len(outs) == 2 and _is_join_stage(nxt):
        st.legs = [p_ if p_ is not None else o for o, p_ in zip(outs, pres)]
    else:
        st.legs = None
    out = outs[0]
    for other in outs[1:]:
        out = out.unionByName(other, allowMissingColumns=True)
    st.df = out
    st.last_sort_toks = []


def compile_pipeline(df: DataFrame, src: str,
                     ctx: Context | None = None,
                     names_out: dict[str, str] | None = None) -> DataFrame:
    """Compile a zed pipeline over one input frame.

    A `const` prologue (demo/etl.zed:1-9) binds names visible to every
    stage. Raises ZedSyntaxError on anything outside the supported surface —
    never a silent wrong answer.

    `names_out` (optional dict) receives the named-type DECORATIONS the
    program declared on nested paths (cast-to-named inside record
    literals / assignments): {dotted path: zed type name}. Spark's
    unified schema cannot nest the tag itself (SURVEY §1.2); the
    registry carries it out-of-band — persist it with the frame via
    Pool.load(type_names=...) and feed it back through
    Context(path_names=...) so typeof(path)/cast(x, typeof(path))
    consult it on later reads. Top-LEVEL tags still ride the zed_type
    discriminator column, as before.
    """
    base_ctx = ctx or Context()
    src = strip_const_prologue(src, base_ctx)
    stages = _split_stages(tokenize(src))
    st = _State(df=df, ctx=base_ctx)
    for i, toks in enumerate(stages):
        _apply_stage(st, toks, stages[i + 1] if i + 1 < len(stages) else None)
    if names_out is not None:
        names_out.update(base_ctx.names_sink)
    return st.df


def _parse_pool_name(p: _StageParser) -> str:
    """Pool names are quoted strings (`pool "Raw"`, demo/pending.zed:3) or
    dotted identifiers (`pool raw`, demo/update.zed:2)."""
    t = p.peek()
    if t.kind == "string":
        p.next()
        return t.text[1:-1].encode().decode("unicode_escape")
    path = p._parse_path_only()
    return ".".join(path)


def _apply_from_block(st: _State, p: _StageParser) -> None:
    """``from ( pool NAME => stage | stage ... pool NAME2 => ... )`` —
    the reference's multi-source scan block (demo/update.zed:1-5,
    demo/pending.zed:2-5, design.md:347-352). Each pool's sub-pipeline
    compiles independently over that pool's frame; the block emits the
    union (zed's merged scan) and records the legs for a following `join`
    stage. If every leg ends in the SAME sort, that ordering is carried
    forward so a downstream ordered collect/tail can re-establish it."""
    legs: list[DataFrame] = []
    leg_sorts: list[tuple[tuple[str, ...], bool]] = []
    leg_toks: list[list[list[Token]]] = []
    while not p.accept("op", ")"):
        t = p.next()
        if not (t.kind == "ident" and t.text == "pool"):
            raise ZedSyntaxError(
                f"expected `pool` in from block, got {t.text!r} at {t.pos}")
        name = _parse_pool_name(p)
        if st.tables is None or name not in st.tables:
            raise ZedSyntaxError(f"unknown pool {name!r} in from block")
        body: list[Token] = []
        depth = 0
        t = p.peek()
        has_body = t.kind == "op" and t.text == "="
        if has_body:
            p.expect("op", "=")
            p.expect("op", ">")
        # body: tokens until the next top-level `pool` or the closing `)`
        while has_body:
            t = p.peek()
            if t.kind == "eof":
                raise ZedSyntaxError("unterminated from block")
            if depth == 0 and t.kind == "op" and t.text == ")":
                break
            if depth == 0 and t.kind == "ident" and t.text == "pool":
                break
            if t.kind == "op" and t.text in "([{":
                depth += 1
            elif t.kind == "op" and t.text in ")]}":
                depth -= 1
            body.append(p.next())
        sub = _State(df=st.tables[name], ctx=st.ctx, tables=st.tables)
        bstages = _split_stages(body + [Token("eof", "", t.pos)])
        for bi, stg in enumerate(bstages):
            _apply_stage(sub, stg,
                         bstages[bi + 1] if bi + 1 < len(bstages) else None)
        legs.append((sub.df, sub.pre_sort_df))
        leg_sorts.append((tuple(" ".join(k.text for k in kt)
                                for kt in sub.last_sort_toks),
                          sub.last_sort_desc))
        leg_toks.append(sub.last_sort_toks)
    p.expect("eof")
    if not legs:
        raise ZedSyntaxError("empty from block")
    if len(legs) == 1:
        # single-source block: plain scan, the leg's sort (if any) is the
        # user-visible output order — keep it
        st.legs = None
        st.df = legs[0][0]
    else:
        # multi-leg: join/union output order is undefined in a distributed
        # engine anyway (the captured sort keys still flow to ordered
        # collect / tail), so a leg whose FINAL stage is sort hands its
        # PRE-sort frame onward — the global range-partition sort per leg
        # would be pure wasted shuffle.
        flat = [pre if pre is not None else df_ for df_, pre in legs]
        st.legs = flat
        out = flat[0]
        for other in flat[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        st.df = out
    if leg_sorts and all(s == leg_sorts[0] for s in leg_sorts) \
            and leg_sorts[0][0]:
        st.last_sort_toks = leg_toks[0]
        st.last_sort_desc = leg_sorts[0][1]
    else:
        st.last_sort_toks = []


def _apply_join(st: _State, p: _StageParser, jtype: str) -> None:
    """``[anti|left|inner] join on <leftkey>=<rightkey> [f:=<expr>, ...]``
    over the two legs of the preceding from block (demo/update.zed:6,
    demo/pending.zed:5, design.md:351). The left leg survives; graft
    clauses evaluate in the RIGHT record's scope (zed join semantics) and
    assign onto the left record. Scale: compiles to a plain hash
    equi-join on the key — broadcastable when the right leg is small,
    AQE-planned otherwise; anti join is left_anti (the done-marker
    subtraction idiom)."""
    if st.legs is None or len(st.legs) != 2:
        raise ZedSyntaxError(
            "join needs a preceding two-source from block "
            "(from ( pool a => ... pool b => ... ) | join on k=k)")
    left, right = st.legs
    t = p.next()
    if not (t.kind == "ident" and t.text == "on"):
        raise ZedSyntaxError(f"expected `on` after join, got {t.text!r}")
    lk = p._parse_path_only()
    p.expect("op", "=")
    rk = p._parse_path_only()
    lctx = Context(roots=dict(st.ctx.roots), schema=left.schema,
                   named_types=dict(st.ctx.named_types),
                   path_names=st.ctx.path_names,
                   names_sink=st.ctx.names_sink)
    rctx = Context(roots=dict(st.ctx.roots), schema=right.schema,
                   named_types=dict(st.ctx.named_types),
                   path_names=st.ctx.path_names,
                   names_sink=st.ctx.names_sink)
    lcol = lctx.resolve(lk)
    rkey = rctx.resolve(rk)
    if jtype == "anti":
        p.expect("eof")
        rdf = right.select(rkey.alias("__zjk"))
        st.df = left.join(rdf, lcol == rdf["__zjk"], "left_anti")
    else:
        rdf = right.select(rkey.alias("__zjk"),
                           F.struct("*").alias("__zright"))
        joined = left.join(rdf, lcol == rdf["__zjk"],
                           "inner" if jtype == "inner" else "left")
        # graft clauses: expressions resolve against the right record
        graft_ctx = Context(roots=dict(st.ctx.roots), schema=right.schema,
                            default_root=F.col("__zright"),
                            named_types=dict(st.ctx.named_types),
                            path_names=st.ctx.path_names,
                            names_sink=st.ctx.names_sink)
        gp = _StageParser(p.toks[p.i:], graft_ctx)
        if gp.peek().kind != "eof":
            for path, col in gp.parse_assign_list():
                joined = _apply_assign(joined, path, col)
        gp.expect("eof")
        st.df = joined.drop("__zjk", "__zright")
    st.legs = None


def _apply_stage(st: _State, toks: list[Token],
                 nxt: list[Token] | None = None) -> None:
    if not toks or toks[0].kind == "eof":
        return
    head = toks[0]
    word = head.text if head.kind == "ident" else None
    if word != "sort":
        # pre_sort_df is only meaningful while sort is the latest stage
        st.pre_sort_df = None
    if not _is_join_stage(toks):
        # join legs are only valid for the stage IMMEDIATELY after the
        # two-source from block / fork that produced them. Any intervening
        # stage (where, yield, sort, ...) transforms the UNION frame, not
        # the legs — a join after it would silently discard that stage's
        # effect, so the legs are invalidated here and such a join raises
        # "join needs a preceding two-source from block" instead.
        st.legs = None

    if word == "from":
        if st.tables is None:
            raise ZedSyntaxError("`from` needs a table namespace (run via "
                                 "compile_query over the lake's pools)")
        p = _StageParser(toks, Context(roots=dict(st.ctx.roots),
                                       named_types=dict(st.ctx.named_types),
                                       path_names=st.ctx.path_names,
                                       names_sink=st.ctx.names_sink))
        p.next()
        if p.accept("op", "("):
            _apply_from_block(st, p)
            return
        name = _parse_pool_name(p)
        p.expect("eof")
        if name not in st.tables:
            raise ZedSyntaxError(f"unknown table {name!r} in from")
        st.df = st.tables[name]
        st.legs = None
        st.last_sort_toks = []
        return
    if word in ("switch", "fork") and len(toks) > 1 \
            and toks[1].kind == "op" and toks[1].text == "(":
        # dispatched before the df-presence guard: a fork may open its own
        # `from` per branch (demo/pending.zed:1-10)
        _apply_branch_block(st, toks, word, nxt)
        return
    if word == "switch" and len(toks) > 1 and st.df is not None:
        # `switch <expr> ( case <value> => ... )` — switch ON a subject
        # value (zed's second switch form): each case value compares
        # against the subject, first match wins, default catches the rest.
        # The block paren is found STRUCTURALLY (the top-level "(" whose
        # first token is case/default) — parsing the subject greedily
        # would read `kind (` as a call on the subject.
        depth = 0
        idx = None
        for i in range(1, len(toks)):
            t = toks[i]
            if t.kind != "op":
                continue
            if t.text == "(":
                nt = toks[i + 1] if i + 1 < len(toks) else None
                if depth == 0 and nt is not None and nt.kind == "ident" \
                        and nt.text in ("case", "default"):
                    idx = i
                    break
                depth += 1
            elif t.text in "[{":
                depth += 1
            elif t.text in ")]}":
                depth -= 1
        if idx is None:
            raise ZedSyntaxError(
                "expected `( case ... )` block after switch subject")
        subj_toks = toks[1:idx] + [Token("eof", "", toks[idx].pos)]
        sp = _StageParser(subj_toks, _fresh_ctx(st.df, st.ctx))
        subject = ensure_column(sp.parse_expr(), "switch subject")
        sp.expect("eof")
        _apply_branch_block(st, [toks[0]] + toks[idx:], word, nxt, subject)
        return
    if st.df is None:
        raise ZedSyntaxError("pipeline must start with a `from` stage")
    ctx = _fresh_ctx(st.df, st.ctx)
    p = _StageParser(toks, ctx)

    if word in ("anti", "left", "inner") and len(toks) > 1 \
            and toks[1].kind == "ident" and toks[1].text == "join":
        p.next()
        p.next()
        _apply_join(st, p, word)
        return
    if word == "join":
        p.next()
        _apply_join(st, p, "inner")
        return
    if word in ("fuse", "pass") and toks[1].kind == "eof":
        p.next()
        return
    if word == "uniq" and toks[1].kind == "eof":
        st.df = st.df.distinct()
        return
    if word == "uniq" and toks[1].kind == "op" and toks[1].text == "-" \
            and len(toks) > 2 and toks[2].text == "c" \
            and toks[3].kind == "eof":
        # zed `uniq -c`: collapse duplicates with an occurrence count.
        # The reference collapses ADJACENT duplicates (Unix uniq over the
        # sorted scan); this compiles to group-all-columns + count, which
        # matches adjacency semantics ONLY when the input is sorted by ALL
        # columns (then equal records are necessarily adjacent). Input
        # sorted on a strict prefix key with other columns interleaved
        # would give different counts than Unix-style adjacency — a
        # documented divergence: distributed frames have no stable row
        # adjacency to collapse over, and the grouped form is the
        # partition-independent refinement.
        st.df = st.df.groupBy(*st.df.columns).agg(
            F.count(F.lit(1)).alias("count"))
        st.last_sort_toks = []
        return
    if word == "where":
        p.next()
        st.df = st.df.filter(ensure_column(p.parse_expr(), "predicate"))
        p.expect("eof")
        return
    if word == "assert":
        # zed `assert <expr>` — every record must satisfy the predicate;
        # the first violating record FAILS the query (raise_error inside
        # the filter), rather than being silently dropped. Records pass
        # through unchanged. Null predicates count as violations (zed
        # truthiness).
        p.next()
        start = p.i
        pred = ensure_column(p.parse_expr(), "assert predicate")
        text = " ".join(t.text for t in p.toks[start:p.i])
        p.expect("eof")
        st.df = st.df.filter(
            F.when(F.coalesce(pred, F.lit(False)), F.lit(True)).otherwise(
                F.raise_error(F.lit(f"assert failed: {text}"))))
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
                if isinstance(expr, _TaggedRecord):
                    # yield cast({...}, done) — the record becomes the
                    # output row, its declared name becomes the zed_type
                    # discriminator (the envelope model's named-type
                    # encoding; etl/build.go:181, ztests/etl-zed.yaml:71)
                    tmp = st.df.select(expr.col.alias("_y"))
                    outs.append(tmp.select(
                        *[F.col("_y")[f.name].alias(f.name)
                          for f in expr.dtype.fields],
                        F.lit(expr.name).alias("zed_type")))
                    if not p.accept("op", ","):
                        break
                    continue
                expr = ensure_column(expr, "yield value")
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
        st.last_sort_toks = []
        return
    if word == "cut":
        p.next()
        items: list[tuple[list[str], Column | None]] = []
        while True:
            path = p._parse_path_only()
            if p.accept("assign"):
                p._fstack.extend(path)  # absolute decoration paths
                v = p.parse_expr()
                del p._fstack[len(p._fstack) - len(path):]
                if isinstance(v, _TaggedRecord):
                    p.ctx.names_sink[".".join(path)] = v.name
                    v = v.col
                items.append((path, ensure_column(v, "cut value")))
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
            if len(new) == 1 and len(old) == 1:
                st.df = st.df.withColumnRenamed(old[0], new[0])
            else:
                # nested rename (zed renames within a record): the new and
                # old paths must share the containing record — copy the
                # field under the new name, drop the old (one withColumn,
                # no data movement)
                if new[:-1] != old[:-1]:
                    raise ZedSyntaxError(
                        "rename cannot move a field across records "
                        f"({'.'.join(old)} -> {'.'.join(new)})")
                st.df = _apply_drop(
                    _apply_assign(st.df, new, ctx.resolve(old)), old)
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
        key_toks: list[list[Token]] = []
        while True:
            start = p.i
            e = ensure_column(p.parse_expr(), "sort key")
            key_toks.append(p.toks[start:p.i])
            # zed sorts nulls last in both directions
            keys.append(e.desc_nulls_last() if desc else e.asc_nulls_last())
            if not p.accept("op", ","):
                break
        p.expect("eof")
        st.pre_sort_df = st.df
        # Sort elision: when the NEXT stage is an aggregation, the only
        # order-sensitive consumer is collect() — which re-establishes the
        # order per group via sort_array over the captured keys. Skipping
        # the physical orderBy here removes a global range-partition sort
        # of the whole input from the plan (Catalyst keeps sorts under
        # order-sensitive aggregates, so it cannot do this elision itself).
        if nxt is None or not _looks_like_agg(nxt):
            st.df = st.df.orderBy(*keys)
        st.last_sort_toks = key_toks
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
        if not st.last_sort_toks:
            raise ZedSyntaxError(
                "tail requires a preceding sort: a distributed engine has no "
                "stable input order to take the last N of (the reference's "
                "tail rides the pool's offset order; sort kafka.offset first)")
        raw = _sort_key_cols(st, ctx)
        desc = not st.last_sort_desc
        rev = [e.desc_nulls_last() if desc else e.asc_nulls_last()
               for e in raw]
        fwd = [e.desc_nulls_last() if st.last_sort_desc else e.asc_nulls_last()
               for e in raw]
        st.df = st.df.orderBy(*rev).limit(n).orderBy(*fwd)
        return
    if word == "top":
        # zed `top N e1, e2` — the explicit top-k operator (descending by
        # the keys). Compiles to orderBy(desc).limit, which Catalyst turns
        # into TakeOrderedAndProject: per-partition heaps + one tiny
        # driver merge, never a global sort — the formulation you want at
        # any scale.
        p.next()
        t = p.peek()
        n = 1
        if t.kind == "int":
            p.next()
            n = int(t.text)
        keys = []
        key_toks = []
        if p.peek().kind != "eof":
            while True:
                start = p.i
                e = ensure_column(p.parse_expr(), "top key")
                key_toks.append(p.toks[start:p.i])
                keys.append(e.desc_nulls_last())
                if not p.accept("op", ","):
                    break
        p.expect("eof")
        if not keys:
            raise ZedSyntaxError("top needs at least one key expression")
        st.df = st.df.orderBy(*keys).limit(n)
        st.last_sort_toks = key_toks
        st.last_sort_desc = True
        return
    if word == "grep":
        # zed `grep <pattern> [<expr>]` — substring search over one
        # expression, or over every top-level string column when no
        # expression is given (the operator form of the grep() function;
        # pattern-match filters push to the scan like any predicate).
        p.next()
        t = p.expect("string")
        pat = t.text[1:-1].encode().decode("unicode_escape")
        if p.peek().kind == "eof":
            strs = [f.name for f in st.df.schema.fields
                    if f.dataType.simpleString() == "string"]
            if not strs:
                raise ZedSyntaxError(
                    "grep without an expression needs at least one string "
                    "column in scope")
            pred = F.lit(False)
            for name_ in strs:
                pred = pred | F.col(name_).contains(pat)
        else:
            pred = ensure_column(p.parse_expr(), "grep target").cast("string").contains(pat)
            p.expect("eof")
        st.df = st.df.filter(pred)
        return
    if word == "over":
        # zed `over <expr> [with n=<expr>, ...] [=> ( stages )]` — array
        # traversal: each element becomes a top-level value (struct
        # elements expand to records, like yield). The lateral form runs
        # a sub-pipeline in element scope, `with` bindings carrying
        # parent-scope values in as columns (zed lateral subqueries,
        # public zed docs). One generator expression (explode) + ordinary
        # stages — map-side unless the sub-pipeline itself shuffles.
        p.next()
        start = p.i
        expr = ensure_column(p.parse_expr(), "over target")
        segs = [t.text for t in p.toks[start:p.i] if t.kind == "ident"]
        binds: list[tuple[str, Column]] = []
        if p.peek().kind == "ident" and p.peek().text == "with":
            p.next()
            while True:
                nt = p.next()
                if not (nt.kind == "ident" and nt.text.isidentifier()):
                    raise ZedSyntaxError(
                        f"expected binding name after with, got {nt.text!r} "
                        f"at {nt.pos}")
                nxt2 = p.toks[p.i + 1] if p.i + 1 < len(p.toks) else None
                is_arrow = (nxt2 is not None and nxt2.kind == "op"
                            and nxt2.text == ">")
                if (p.peek().kind == "op" and p.peek().text == "="
                        and not is_arrow):
                    p.next()
                    val = ensure_column(p.parse_expr(), "with binding")
                else:
                    # `with x` sugar: bind the parent field of that name
                    # (a following `=` belongs to the `=>` arrow)
                    val = ctx.resolve([nt.text])
                binds.append((nt.text, val))
                if not p.accept("op", ","):
                    break
        body: list[Token] | None = None
        if (p.peek().kind == "op" and p.peek().text == "="
                and p.i + 1 < len(p.toks)
                and p.toks[p.i + 1].kind == "op"
                and p.toks[p.i + 1].text == ">"):
            p.next()
            p.next()
            p.expect("op", "(")
            body = []
            depth = 0
            while True:
                t = p.peek()
                if t.kind == "eof":
                    raise ZedSyntaxError("unterminated over sub-pipeline")
                if t.kind == "op" and t.text in "([{":
                    depth += 1
                elif t.kind == "op" and t.text in ")]}":
                    if depth == 0:
                        p.next()
                        break
                    depth -= 1
                body.append(p.next())
        p.expect("eof")
        bound = [col.alias(nm) for nm, col in binds]
        exploded = st.df.select(*bound, F.explode(expr).alias("_ov"))
        etype = exploded.schema["_ov"].dataType
        bind_names = [nm for nm, _ in binds]
        if isinstance(etype, StructType):
            st.df = exploded.select(
                *bind_names,
                *[F.col("_ov")[f.name].alias(f.name) for f in etype.fields])
        else:
            name_ = segs[-1] if segs else "value"
            st.df = exploded.select(*bind_names, F.col("_ov").alias(name_))
        st.last_sort_toks = []
        if body:
            sub = _State(df=st.df, ctx=st.ctx, tables=st.tables)
            bstages = _split_stages(body + [Token("eof", "", p.toks[-1].pos)])
            for bi, stage in enumerate(bstages):
                _apply_stage(sub, stage,
                             bstages[bi + 1] if bi + 1 < len(bstages) else None)
            st.df = sub.df
            st.last_sort_toks = sub.last_sort_toks
            st.last_sort_desc = sub.last_sort_desc
        return
    if _looks_like_agg(toks):
        if word == "summarize":
            p.next()
        ordered = None
        if st.last_sort_toks and _sort_keys_resolvable(st, ctx, st.df):
            ordered = (_sort_key_cols(st, ctx), st.last_sort_desc)
        aggs, keys = _parse_agg_stage(p, ordered)
        p.expect("eof")
        if keys:
            st.df = st.df.groupBy(*keys).agg(*aggs)
        else:
            st.df = st.df.agg(*aggs)
        st.last_sort_toks = []
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
    start = p.i
    pred = ensure_column(p.parse_expr(), "predicate")
    # zed search syntax: space-separated predicates AND together
    # (demo/pending.zed:4 `is(<done>) kafka.topic=="Invoices"`) — but ONLY
    # when the first conjunct is predicate-shaped. A bare dotted path with
    # trailing tokens (`explode tag`) is almost certainly a typo'd
    # operator, and that must surface as a syntax error, not a silent AND.
    if p.peek().kind != "eof":
        first_is_bare_path = all(
            t.kind == "ident" or (t.kind == "op" and t.text == ".")
            for t in p.toks[start:p.i])
        if first_is_bare_path:
            t = p.peek()
            raise ZedSyntaxError(
                f"unknown operator or trailing token {t.text!r} at {t.pos}")
        while p.peek().kind != "eof":
            pred = pred & ensure_column(p.parse_expr(), "predicate")
    p.expect("eof")
    st.df = st.df.filter(pred)


def compile_query(src: str, tables: dict[str, DataFrame],
                  ctx: Context | None = None,
                  names_out: dict[str, str] | None = None) -> DataFrame:
    """Compile `[from NAME |] stage | ...` against a table namespace (the
    lake's pools, or any registered frames). Without a `from` head, the
    namespace must hold exactly one table. `names_out`: as in
    compile_pipeline — collects nested named-type decorations."""
    base_ctx = ctx or Context()
    src = strip_const_prologue(src, base_ctx)
    toks = tokenize(src)
    stages = _split_stages(toks)
    starts_with_from = (
        stages and stages[0]
        and stages[0][0].kind == "ident" and stages[0][0].text == "from"
    )
    # fork blocks may open their own `from` per branch (demo/pending.zed)
    starts_with_fork = (
        stages and stages[0]
        and stages[0][0].kind == "ident" and stages[0][0].text == "fork"
    )
    if starts_with_from:
        df = None
    elif len(tables) == 1:
        # fork-first pipelines over the single implicit table keep the
        # fallback: the fork's branches transform that frame (branches
        # that open their own `from` simply replace it per branch)
        df = next(iter(tables.values()))
    elif starts_with_fork:
        # multi-table namespace: a leading fork must open a `from` in
        # every branch (demo/pending.zed) — no implicit input exists
        df = None
    else:
        raise ZedSyntaxError("pipeline without `from` needs exactly one table")
    st = _State(df=df, ctx=base_ctx, tables=dict(tables))
    for i, s in enumerate(stages):
        _apply_stage(st, s, stages[i + 1] if i + 1 < len(stages) else None)
    if names_out is not None:
        names_out.update(base_ctx.names_sink)
    return st.df
