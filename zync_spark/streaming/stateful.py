"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps ALL streaming state in the lake (done markers,
README.md:352-369) and has no in-stream stateful operator; these are
beyond-reference operators for the event-time features of SURVEY §7 M5.

Scale design: state lives in Spark's per-key state store (RocksDB-capable,
checkpointed, partitioned by the grouping key), so the operator scales with
keys × state size, not stream length. Arrow batches cross the Python
boundary once per key per micro-batch — the Pandas-UDF slow path, but
amortized over the batch, and the only way to express custom
gap-close/timeout logic Structured Streaming's built-ins don't have.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# state carries micros-since-epoch longs: timezone-proof across the
# Arrow / Python / JVM hops.
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize_with_state(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator.

    Emits one row per CLOSED session (closed by a later same-user event
    more than `gap_minutes` after it, or by event-time timeout once the
    watermark passes end+gap). Equivalent batch semantics: q_sessionize's
    gap-split windows — the golden test cross-checks the two.

    Input needs (user_id, ts, value) columns; event-time column `ts`.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            if state.exists:
                s, last, n, total = state.get
                closed.append((s, last, n, total))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            # ignore_index: a key spanning several Arrow chunks would
            # otherwise concat to duplicate index labels and the reindex
            # below raises — exactly at the >maxRecordsPerBatch scale
            # this operator targets
            rows = pd.concat(list(pdfs), ignore_index=True)
            # micro-batch rows are unordered; sessions need time order
            ts_us = (
                rows["ts"].astype("datetime64[us]").astype("int64").sort_values()
            )
            vals = rows["value"].reindex(ts_us.index)
            for t, v in zip(ts_us.to_list(), vals.to_list()):
                if cur is None:
                    cur = [t, t, 1, float(v)]
                elif t > cur[1] + gap_us:
                    closed.append(tuple(cur))
                    cur = [t, t, 1, float(v)]
                elif t < cur[0] - gap_us:
                    # cross-batch late event older than the open session
                    # by more than the gap: its own already-complete
                    # session (bounded-lateness tradeoff — merging it
                    # forward would corrupt the open session's span)
                    closed.append((t, t, 1, float(v)))
                else:
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += float(v)
            state.update(tuple(cur))
            # fire a timeout once the watermark passes the gap horizon so
            # the trailing session eventually closes without new input
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
