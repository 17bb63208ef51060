"""The reference's "update demo" narrative (design.md:250-376) end-to-end
through the REAL pool layer: load demo/consume-1 into a raw pool, run the
ETL program, sync the result + cursor into staging (demo/staging-1), load
demo/consume-2, run demo/update-etl.zed VERBATIM over both pools, and
check every documented intermediate against design.md:

- first ETL pass  → {customerID:1,menuID:200,qty:2,total:3.98}  (:292)
- cursor query    → {max:2}                                     (:331-334)
- update-etl pass → {customerID:2,menuID:100,qty:1,total:5.99}  (:365)

plus the same update.zed text driven through `cli query --zed` over the
lake directory (the reference's `zed query -I demo/update.zed`,
design.md:353-356).
"""

from __future__ import annotations

import json
import os

import pytest

from zync_spark.pool import Pool
from zync_spark.zedpipe import compile_query

STAGING_SCHEMA = (
    "seqno long, kafka struct<topic:string,offset:long>, "
    "row struct<customerID:long,menuID:long,qty:long,total:double>, "
    "zed_type string"
)

# The demo inputs load VERBATIM from the reference's own files via the
# round-4 ZSON reader — no hand-built fixtures (they used to transcribe
# these files row by row).
DEMO = "/root/reference/demo"

# demo/etl.zed with the scan order made explicit: the reference's collect
# rides the pool's implicit seqno order; a distributed scan has no implicit
# order, so the program declares it (one stage; the sort itself is elided
# into the per-group ordered collect — no global sort executes).
ETL_ZED = """
const customerIDs = |{ "jane": 1, "bob": 2, "sarah": 3 }|
const menuIDs = |{ "burrito": 100, "taco": 200, "chips": 300 }|
from raw
| sort seqno
| records:=collect(this),seqno:=max(seqno),done:=or(value.done) by txn:=value.txn
| done==true
| yield {
    customerID:customerIDs[records[0].value.row.customer],
    menuID:menuIDs[records[0].value.row.product],
    qty: records[0].value.row.qty,
    total: records[0].value.row.qty * records[1].value.row.price
  }
"""

UPDATE_ETL_ZED = """
const customerIDs = |{ "jane": 1, "bob": 2, "sarah": 3 }|
const menuIDs = |{ "burrito": 100, "taco": 200, "chips": 300 }|
from (
  pool raw => seqno >= 2 | sort seqno
  pool staging => not is(<cursor>) | seqno >= 2 | cut seqno | sort seqno
)
| anti join on seqno=seqno
| records:=collect(this),seqno:=max(seqno),done:=or(value.done) by txn:=value.txn
| done==true
| yield {
    customerID:customerIDs[records[0].value.row.customer],
    menuID:menuIDs[records[0].value.row.product],
    qty: records[0].value.row.qty,
    total: records[0].value.row.qty * records[1].value.row.price
  }
"""

UPDATE_ZED = """
from (
  pool raw => seqno >= 2 | sort seqno
  pool staging => not is(<cursor>) | seqno >= 2 | cut seqno | sort seqno
)
| anti join on seqno=seqno
| cut seqno
| sort seqno
"""


def test_update_demo_end_to_end(spark, tmp_path, capsys):
    lake = str(tmp_path)
    raw = Pool.create(spark, os.path.join(lake, "raw"))
    staging = Pool.create(spark, os.path.join(lake, "staging"))

    # -- zync consume → zed load raw (design.md:254-257)
    from zync_spark import zson

    raw.load(zson.read(spark, f"{DEMO}/consume-1.zson")[0], "consume-1")

    # -- zed query -I demo/etl.zed (design.md:278-292)
    out1 = compile_query(ETL_ZED, {"raw": raw.scan()}).collect()
    assert len(out1) == 1
    r = out1[0]
    assert (r["customerID"], r["menuID"], r["qty"]) == (1, 200, 2)
    assert r["total"] == pytest.approx(3.98)

    # -- zync sync → demo/staging-1.zson (design.md:297-309): the ETL'd
    # record wrapped in kafka meta at the bundle's max seqno, plus the
    # cursor at the lowest pending seqno — the reference's OWN staging
    # snapshot file, decorators and all ((=cursor) → zed_type)
    staging.load(zson.read(spark, f"{DEMO}/staging-1.zson")[0], "staging-1")

    # -- find the current cursor (design.md:330-334: "{max:2}")
    cur = compile_query(
        "from staging | is(<cursor>) | summarize max(seqno)",
        {"raw": raw.scan(), "staging": staging.scan()},
    ).collect()
    assert [r["max"] for r in cur] == [2]

    # -- zed load raw demo/consume-2.zson (design.md:325-328)
    raw.load(zson.read(spark, f"{DEMO}/consume-2.zson")[0], "consume-2")

    # -- zed query -I demo/update.zed through the CLI over the lake
    # (design.md:353-361: exactly the pending records, seqno 2 and 4)
    from zync_spark.cli import main

    assert main(["--lake", lake, "query", "--zed", UPDATE_ZED]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [x["seqno"] for x in lines] == [2, 4]

    # same program from a file: `query -I update.zed` (zed query -I)
    prog = os.path.join(lake, "update.zed")
    with open(prog, "w") as f:
        f.write(UPDATE_ZED)
    assert main(["--lake", lake, "query", "-I", prog]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [x["seqno"] for x in lines] == [2, 4]

    # -- zed query -I demo/update-etl.zed VERBATIM (design.md:362-366)
    out2 = compile_query(
        UPDATE_ETL_ZED, {"raw": raw.scan(), "staging": staging.scan()}
    ).collect()
    assert len(out2) == 1
    r = out2[0]
    assert (r["customerID"], r["menuID"], r["qty"]) == (2, 100, 1)
    assert r["total"] == pytest.approx(5.99)

    # -- the second sync (design.md:368-375) closes the loop: after it,
    # no done transaction remains unprocessed
    staging.load(
        spark.createDataFrame(
            [
                (4, ("order", 2), (2, 100, 1, 5.99), "data"),
                (4, ("order", 2), None, "cursor"),
            ],
            STAGING_SCHEMA,
        ),
        "staging-2",
    )
    out3 = compile_query(
        UPDATE_ETL_ZED, {"raw": raw.scan(), "staging": staging.scan()}
    ).collect()
    assert out3 == []
