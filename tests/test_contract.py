"""Driver-contract invariants on __spark_entry__ and bench.py — cheap
static checks that fail fast if a refactor breaks the external gate's
assumptions (the expensive end-to-end versions run via tools/)."""

import pytest
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_contract_shapes():
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    Q, O = E.queries(), E.oracle_sql()
    assert callable(E.entry)
    assert Q and set(O) <= set(Q)
    # every oracle is non-empty SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in O.values())
    from zync_spark.queries import HEADLINE

    assert set(HEADLINE) <= set(Q)
    # headline queries must all be oracle-paired (bench_duck times the twins)
    assert set(HEADLINE) <= set(O)


def test_coverage_doc_counts():
    """COVERAGE.md's 'Catalog totals' paragraph must match the live
    catalog — round 3 shipped with a stale count; this pins the doc to
    len(queries()) so it can't drift again."""
    sys.path.insert(0, REPO)
    import re

    import __spark_entry__ as E

    Q, O = E.queries(), E.oracle_sql()
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    m = re.search(r"(\d+) catalog queries; (\d+) oracle-paired", text)
    assert m, "COVERAGE.md lost its 'Catalog totals' count line"
    assert (int(m.group(1)), int(m.group(2))) == (len(Q), len(O)), (
        f"COVERAGE.md says {m.group(1)}/{m.group(2)} but the catalog is "
        f"{len(Q)}/{len(O)} — update the 'Catalog totals' paragraph"
    )


@pytest.mark.slow
def test_bench_emits_one_json_line():
    # sf0.001 keeps this a smoke test; the driver runs sf0.1
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["unit"] == "sec" and d["value"] > 0
    assert set(d["queries"]) == set(json.loads(line)["cold_queries"])
