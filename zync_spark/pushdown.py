"""Predicate → manifest-bounds pushdown for zed programs over pools.

Catalyst already pushes filters to the parquet scan (row-group pruning),
but only AFTER Spark has listed and planned every live file in the pool.
For a pool whose loads/compactions recorded per-file `col_stats`
(`Pool.load(cluster_by=)` / `compact`), the manifest can answer "which
files could hold matching rows" without touching the filesystem at all —
the same `scan(bounds=)` skipping the incremental indexes use
(`pool.py:939` `_may_overlap`), here derived automatically from the
user's program text.

`program_bounds` extracts, per pool, a file-skip bounds dict from the
LEADING filter stages of a zed pipeline (`where x > 5` or a bare
`x > 5` stage — both filter forms, `zedpipe.py:905`). It is sound by
construction:

- only top-level `and` conjuncts of `<dotted.path> <cmp> <literal>`
  contribute; `or`, `not`, function calls, path-vs-path comparisons or
  anything else makes the STAGE contribute nothing;
- extraction stops at the first non-filter stage (a later filter may
  see renamed/derived columns, so only leading filters are safe);
- the compiled pipeline still applies every filter in full — bounds
  only ever REMOVE whole files whose recorded [min,max] provably cannot
  match, and files/columns without stats are always kept.

The reference's lake does the analogous pruning natively from commit
metadata (its Zed lake scans carry range pruning); this gives zed
programs run through `cli query --zed` the same property on pools.
"""

from __future__ import annotations

from zync_spark.zedexpr import Context, Token, tokenize

_CMP = {"==", ">=", "<=", ">", "<"}
_STOP_WORDS = {
    # stage heads that end the leading-filter prefix (anything
    # unrecognized also stops — this set is just documentation of the
    # common ones)
    "cut", "yield", "sort", "head", "tail", "top", "fuse", "switch",
    "fork", "join", "summarize", "over", "uniq", "assert", "shape",
}


def _literal(tok: Token):
    """Comparable literal value, or None when the token isn't one we can
    soundly compare against parquet stats (durations, bools, null)."""
    if tok.kind == "int":
        return int(tok.text)
    if tok.kind == "float":
        return float(tok.text)
    if tok.kind == "string":
        return tok.text[1:-1].encode().decode("unicode_escape")
    return None


def _path(toks: list[Token], i: int, banned: frozenset = frozenset()):
    """Parse `ident(.ident)*` at i → (dotted_path, next_i) or None.
    A leading `this.` is the record root and strips off. A head bound
    as a `const` root is NOT a column — comparing it is constant
    folding, not a scan predicate (soundness, not style)."""
    if i >= len(toks) or toks[i].kind not in ("ident", "this"):
        return None
    if toks[i].kind == "ident" and toks[i].text in banned:
        return None
    parts = [toks[i].text]
    i += 1
    while (
        i + 1 < len(toks)
        and toks[i].kind == "op" and toks[i].text == "."
        and toks[i + 1].kind == "ident"
    ):
        parts.append(toks[i + 1].text)
        i += 2
    if parts[0] == "this":
        parts = parts[1:]
        if not parts:
            return None
    return ".".join(parts), i


def _stage_conjuncts(toks: list[Token], banned: frozenset = frozenset()):
    """`[where] cmp (and cmp)* eof` → [(path, op, value)], else None.
    cmp is `<path> <op> <literal>` or flipped."""
    i = 0
    if toks and toks[i].kind == "ident" and toks[i].text == "where":
        i = 1
    out = []
    while True:
        got = _path(toks, i, banned)
        flipped = False
        if got is None:
            # literal-first form: 5 < x
            lit = _literal(toks[i]) if i < len(toks) else None
            if lit is None:
                return None
            i += 1
            if i >= len(toks) or toks[i].kind != "op" or toks[i].text not in _CMP:
                return None
            op = toks[i].text
            i += 1
            got = _path(toks, i, banned)
            if got is None:
                return None
            path, i = got
            val, flipped = lit, True
        else:
            path, i = got
            if i < len(toks) and toks[i].kind == "in":
                # `path in [lit, lit, ...]` → point-set bound
                i += 1
                if i >= len(toks) or toks[i].kind != "op" or toks[i].text != "[":
                    return None
                i += 1
                vals = []
                while True:
                    v = _literal(toks[i]) if i < len(toks) else None
                    if v is None:
                        return None
                    vals.append(v)
                    i += 1
                    if i < len(toks) and toks[i].kind == "op" and toks[i].text == ",":
                        i += 1
                        continue
                    break
                if i >= len(toks) or toks[i].kind != "op" or toks[i].text != "]":
                    return None
                i += 1
                out.append((path, "in", vals))
                if i < len(toks) and toks[i].kind == "and":
                    i += 1
                    continue
                if i >= len(toks) or toks[i].kind == "eof":
                    return out
                return None
            if i >= len(toks) or toks[i].kind != "op" or toks[i].text not in _CMP:
                return None
            op = toks[i].text
            i += 1
            val = _literal(toks[i]) if i < len(toks) else None
            if val is None:
                return None
            i += 1
        if flipped:
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "==": "=="}[op]
        out.append((path, op, val))
        if i < len(toks) and toks[i].kind == "and":
            i += 1
            continue
        if i >= len(toks) or toks[i].kind == "eof":
            return out
        return None


def _merge(bounds: dict, conjuncts) -> dict:
    """Intersect per column: (lo, hi) ranges tighten, `in` point sets
    intersect (set ∧ set → common values; set ∧ range → set filtered to
    the range). Strict < / > still use the literal as an inclusive
    file-skip bound (sound: at worst keeps a boundary file the filter
    then empties)."""
    for path, op, val in conjuncts:
        prev = bounds.get(path)
        if op == "in":
            vals = set(val)
            if isinstance(prev, list):
                vals &= set(prev)
            elif prev is not None:
                lo, hi = prev
                vals = {v for v in vals
                        if not (lo is not None and _gt(lo, v))
                        and not (hi is not None and _gt(v, hi))}
            bounds[path] = sorted(vals, key=repr)
            continue
        if op == "==":
            nlo, nhi = val, val
        elif op in (">=", ">"):
            nlo, nhi = val, None
        else:
            nlo, nhi = None, val
        if isinstance(prev, list):
            bounds[path] = sorted(
                (v for v in prev
                 if not (nlo is not None and _gt(nlo, v))
                 and not (nhi is not None and _gt(v, nhi))), key=repr)
            continue
        lo, hi = prev if prev is not None else (None, None)
        if nlo is not None and (lo is None or _gt(nlo, lo)):
            lo = nlo
        if nhi is not None and (hi is None or _gt(hi, nhi)):
            hi = nhi
        bounds[path] = (lo, hi)
    return bounds


def _gt(a, b) -> bool:
    try:
        return a > b
    except TypeError:
        # mixed-type conjuncts (x > 5 and x > "a"): no tightening
        return False


def _leading_bounds(stages: list[list[Token]], start: int,
                    banned: frozenset = frozenset()) -> dict:
    bounds: dict = {}
    for s in stages[start:]:
        if not s or s[0].kind == "eof":
            continue
        conj = _stage_conjuncts(s, banned)
        if conj is None:
            break
        _merge(bounds, conj)
    return bounds


def where_bounds(expr_src: str) -> dict:
    """Bounds from a single bare zed predicate (`consume --where`):
    the conjuncts it can soundly use, {} otherwise/never-raise."""
    try:
        conj = _stage_conjuncts(tokenize(expr_src)[:-1] or [])
        return _merge({}, conj) if conj else {}
    except Exception:
        return {}


def lower_bounds_from(bounds: dict) -> dict[str, int] | None:
    """Commit-level pruning contract from extracted file bounds: when the
    predicate pins kafka.topic to exactly one value, the reader will only
    look at that topic's rows at-or-past the kafka.offset floor (0 when
    none) — `Pool.scan(lower_bounds=)` then skips whole COMMITS by their
    per-topic manifest stats, which every pool has (col_stats require a
    clustered layout; manifest stats do not). None when the predicate
    doesn't pin a single topic."""
    tb = bounds.get("kafka.topic")
    if isinstance(tb, list):
        topic = tb[0] if len(tb) == 1 else None
    elif isinstance(tb, tuple) and tb[0] is not None and tb[0] == tb[1]:
        topic = tb[0]
    else:
        topic = None
    if not isinstance(topic, str):
        return None
    ob = bounds.get("kafka.offset")
    lo = 0
    if isinstance(ob, tuple) and isinstance(ob[0], int):
        lo = ob[0]
    elif isinstance(ob, list) and ob and all(isinstance(v, int) for v in ob):
        lo = min(ob)
    return {topic: lo}


def merge_bounds(*dicts: dict) -> dict:
    """Intersect several bounds dicts (consume's static topic/offset
    predicate ∧ the user's --where extraction)."""
    out: dict = {}
    for d in dicts:
        for path, b in d.items():
            conj = [(path, "in", b)] if isinstance(b, list) else []
            if not conj:
                lo, hi = b
                if lo is not None:
                    conj.append((path, ">=", lo))
                if hi is not None:
                    conj.append((path, "<=", hi))
            _merge(out, conj)
    return out


def program_bounds(src: str) -> dict[str | None, dict]:
    """{pool_name (or None for the implicit single input): bounds dict
    for Pool.scan(bounds=)}. Empty dict when nothing is extractable —
    including on any parse hiccup (pushdown must never make a valid
    program fail; the compiler reports real syntax errors itself)."""
    try:
        return _program_bounds(src)
    except Exception:
        return {}


def _program_bounds(src: str) -> dict[str | None, dict]:
    from zync_spark.zedpipe import _split_stages, strip_const_prologue

    ctx = Context()
    src = strip_const_prologue(src, ctx)
    banned = frozenset(ctx.roots)  # const names are not columns
    stages = _split_stages(tokenize(src))
    if not stages or not stages[0]:
        return {}
    head = stages[0]
    out: dict[str | None, dict] = {}
    if head[0].kind == "ident" and head[0].text == "from":
        if len(head) > 1 and head[1].kind == "op" and head[1].text == "(":
            # from ( pool A => stage | ... pool B => ... ): per-leg
            # leading filters (token walk mirrors _apply_from_block)
            i = 2
            while i < len(head) and not (
                head[i].kind == "op" and head[i].text == ")"
            ):
                if not (head[i].kind == "ident" and head[i].text == "pool"):
                    return out
                i += 1
                if i >= len(head):
                    return out
                name = (
                    head[i].text[1:-1]
                    if head[i].kind == "string"
                    else head[i].text
                )
                i += 1
                body: list[Token] = []
                if (
                    i + 1 < len(head)
                    and head[i].kind == "op" and head[i].text == "="
                    and head[i + 1].kind == "op" and head[i + 1].text == ">"
                ):
                    i += 2
                    depth = 0
                    while i < len(head):
                        t = head[i]
                        if depth == 0 and t.kind == "op" and t.text == ")":
                            break
                        if depth == 0 and t.kind == "ident" and t.text == "pool":
                            break
                        if t.kind == "op" and t.text in "([{":
                            depth += 1
                        elif t.kind == "op" and t.text in ")]}":
                            depth -= 1
                        body.append(t)
                        i += 1
                if body:
                    sub = _split_stages(body + [Token("eof", "", 0)])
                    b = _leading_bounds(sub, 0, banned)
                    if b:
                        out[name] = b
            return out
        # from NAME | filters...
        if len(head) >= 2 and head[1].kind in ("ident", "string"):
            name = head[1].text[1:-1] if head[1].kind == "string" else (
                ".".join(t.text for t in head[1:] if t.kind == "ident"))
            b = _leading_bounds(stages, 1, banned)
            if b:
                out[name] = b
        return out
    b = _leading_bounds(stages, 0, banned)
    if b:
        out[None] = b
    return out
