"""Property tests for the ExactSubstr span family: Spark results vs an
independent pure-Python reference over hypothesis-generated corpora —
tiny alphabet so cross-doc window collisions are common, adversarial
shapes (empty docs, all-identical docs, within-doc repeats) arise
naturally, and every batch split of the incremental protocol must agree
with the batch operator."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zync_spark.functions.dedup import duplicate_spans

WINDOW = 3
ALPHABET = ["aa", "bb", "cc", "dd"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(ALPHABET), min_size=0, max_size=12),
    min_size=1, max_size=6,
)


def _ref_spans(docs: list[list[str]], window: int, min_docs: int):
    """Independent reference: dict window-text -> occurrences, the
    duplication rule, then a hand-rolled island merge per doc."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, toks in enumerate(docs):
        for p in range(len(toks) - window + 1):
            occ.setdefault(tuple(toks[p:p + window]), []).append((d, p))
    hits: dict[int, set[int]] = {}
    for positions in occ.values():
        nd = len({d for d, _ in positions})
        if len(positions) >= 2 and nd >= min_docs:
            for d, p in positions:
                hits.setdefault(d, set()).add(p)
    spans = set()
    for d, ps in hits.items():
        run_start = prev = None
        for p in sorted(ps):
            if prev is not None and p == prev + 1:
                prev = p
                continue
            if run_start is not None:
                spans.add((d, run_start, prev + window - 1))
            run_start = prev = p
        if run_start is not None:
            spans.add((d, run_start, prev + window - 1))
    return spans


@pytest.mark.parametrize("min_docs", [1, 2])
@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy)
def test_duplicate_spans_matches_reference(spark, docs, min_docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, "doc_id", "text",
                                 window=WINDOW, min_docs=min_docs).collect()
    }
    # empty docs tokenize to [''] (the shared trim/split contract), so
    # the reference must see the same single-empty-token document
    ref_docs = [toks if toks else [""] for toks in docs]
    assert got == _ref_spans(ref_docs, WINDOW, min_docs)


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy, data=st.data())
@pytest.mark.slow
def test_incremental_protocol_matches_reference_on_any_split(
        spark, tmp_path_factory, docs, data):
    """The full sync protocol (probe, lazily-evaluated monotone rule,
    exactly-once dup markers, cross-commit island merge) equals the
    reference under a RANDOM batch split."""
    from zync_spark.pool import Pool
    from zync_spark.streaming import span_index as SI
    from tests.test_span_index import ROW

    n = len(docs)
    cut_points = sorted(data.draw(st.sets(
        st.integers(min_value=1, max_value=max(n - 1, 1)), max_size=2)))
    batches, lo = [], 0
    for c in cut_points + [n]:
        if c > lo:
            batches.append(list(range(lo, c)))
            lo = c
    spec = SI.SpanIndexSpec("docs", "value.doc_id", "value.text",
                            window=WINDOW, min_docs=2)
    base = tmp_path_factory.mktemp("spanprop")
    src = Pool.create(spark, str(base / "src"))
    dest = Pool.create(spark, str(base / "idx"))
    off = 0
    for batch in batches:
        rows = [(("docs", 0, off + j), "data", (d, " ".join(docs[d])))
                for j, d in enumerate(batch)]
        off += len(rows)
        src.load(spark.createDataFrame(rows, ROW), "b")
        SI.sync_spans(src, dest, spec, ["docs"])
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in SI.spans_view(dest, spec).collect()
    }
    ref_docs = [toks if toks else [""] for toks in docs]
    assert got == _ref_spans(ref_docs, WINDOW, 2)
