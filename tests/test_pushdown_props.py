"""Property-based soundness gate for predicate→bounds extraction.

THE invariant pushdown must never break: any row that satisfies a
program's full filter must lie inside every extracted per-column bound
— otherwise a file holding that row could be pruned and the query would
silently lose rows. Hypothesis generates random conjunct programs
(ranges, equalities, flipped literal-first forms, in-lists, multi-stage
splits, `where` prefixes) and random rows; pure Python, no Spark.

The file-level half of the story (recorded min/max can only ever skip
files provably outside a bound) has its own property gate in
test_cluster_skip; end-to-end pruned-vs-unpruned equality is in
test_pushdown.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from zync_spark.pushdown import program_bounds

COLS = {"a": "int", "b": "float", "s": "str"}

_lit = {
    "int": st.integers(min_value=0, max_value=50),
    "float": st.floats(min_value=0, max_value=50, allow_nan=False,
                       width=32).map(lambda v: round(v, 2)),
    "str": st.text(alphabet="abcde", min_size=0, max_size=4),
}


def _render(v) -> str:
    if isinstance(v, str):
        return f'"{v}"'
    return repr(v)


@st.composite
def _conjunct(draw):
    col = draw(st.sampled_from(sorted(COLS)))
    kind = COLS[col]
    if draw(st.booleans()) and kind != "float":
        vals = draw(st.lists(_lit[kind], min_size=1, max_size=4))
        return (col, "in", vals)
    op = draw(st.sampled_from(["==", ">=", "<=", ">", "<"]))
    return (col, op, draw(_lit[kind]))


def _program(conjs, flips, use_where, split_at) -> str:
    def one(c, flip):
        col, op, v = c
        if op == "in":
            return f"value.{col} in [{', '.join(_render(x) for x in v)}]"
        if flip:
            fl = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "==": "=="}
            return f"{_render(v)} {fl[op]} value.{col}"
        return f"value.{col} {op} {_render(v)}"

    parts = [one(c, f) for c, f in zip(conjs, flips)]
    stages = [" and ".join(parts[:split_at]), " and ".join(parts[split_at:])]
    stages = [("where " + s if use_where else s) for s in stages if s]
    return "from t | " + " | ".join(stages)


def _satisfies(row, conjs) -> bool:
    for col, op, v in conjs:
        x = row[col]
        if op == "in":
            ok = x in v
        else:
            ok = {"==": x == v, ">=": x >= v, "<=": x <= v,
                  ">": x > v, "<": x < v}[op]
        if not ok:
            return False
    return True


def _within(x, bound) -> bool:
    if isinstance(bound, list):
        return x in bound
    lo, hi = bound
    return (lo is None or x >= lo) and (hi is None or x <= hi)


@given(
    conjs=st.lists(_conjunct(), min_size=1, max_size=5),
    flips=st.lists(st.booleans(), min_size=5, max_size=5),
    use_where=st.booleans(),
    split_at=st.integers(min_value=0, max_value=5),
    rows=st.lists(
        st.fixed_dictionaries({c: _lit[k] for c, k in COLS.items()}),
        min_size=1, max_size=20),
)
@settings(max_examples=300, deadline=None)
def test_satisfying_rows_lie_within_extracted_bounds(
        conjs, flips, use_where, split_at, rows):
    src = _program(conjs, flips, use_where, split_at)
    bounds = program_bounds(src).get("t", {})
    for row in rows:
        if _satisfies(row, conjs):
            for col, bound in bounds.items():
                leaf = col.split(".")[-1]
                assert _within(row[leaf], bound), (
                    f"row {row} passes filter but falls outside extracted "
                    f"bound {col}={bound} for program {src!r}")


@given(conjs=st.lists(_conjunct(), min_size=1, max_size=3),
       rows=st.lists(
           st.fixed_dictionaries({c: _lit[k] for c, k in COLS.items()}),
           min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_post_transform_filters_never_extract(conjs, rows):
    # a filter AFTER a yield sees derived columns; it must contribute
    # nothing no matter what it says
    tail = " and ".join(
        f"value.{c} == {_render(v)}" if op != "in" else f"value.{c} >= 0"
        for c, op, v in conjs)
    src = f"from t | yield {{v: value}} | {tail}"
    assert program_bounds(src).get("t", {}) == {}
