"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState (task-brief: "applyInPandasWithState for custom
stateful operators"). The reference has no streaming (SURVEY.md §2.10);
this is the training-data-ingest addition.

A session closes when no event arrives for `gap` seconds; the operator
emits one row per closed session (user, start, end, n_events,
sum_value). A processing-time timeout flushes dangling sessions.

A batch analog (`sessionize_batch`) with identical semantics runs on a
static DataFrame via a window gap-cumsum — used as the test oracle.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, s double"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(user_id, ts, value) stream -> closed sessions stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, s = state.get
                rows.append((user_id, start, last, n, s))
                state.remove()
        else:
            ts_list: list[int] = []  # microseconds
            vals: list[float] = []
            for pdf in pdfs:
                for t, v in zip(pd.to_datetime(pdf["ts"]), pdf["value"]):
                    if pd.isna(t):
                        # a null ts carries no position on the timeline;
                        # NaT.value is the int64-min sentinel, which
                        # would otherwise mint a phantom year-1677
                        # session. The batch analog's min/max/ordering
                        # skip nulls the same way.
                        continue
                    ts_list.append(int(t.value) // 1000)
                    # null value contributes 0 to the sum — the batch
                    # analog's F.sum skips nulls identically (the one
                    # divergence: an ALL-null session sums to 0.0 here,
                    # NULL in batch)
                    vals.append(0.0 if pd.isna(v) else float(v))
            order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
            cur = list(state.get) if state.exists else None
            for i in order:
                t_us, v = ts_list[i], vals[i]
                if cur is None:
                    cur = [t_us, t_us, 1, v]
                elif t_us - cur[1] > gap_us:
                    rows.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [t_us, t_us, 1, v]
                else:
                    # a late event from an earlier micro-batch may
                    # predate the stored session start; min() keeps
                    # session_start honest (events within one batch
                    # are sorted, so this only fires cross-batch)
                    cur[0] = min(cur[0], t_us)
                    cur[1] = max(cur[1], t_us)
                    cur[2] += 1
                    cur[3] += v
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(gap_seconds * 1000)
        out = pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch sessionization with the same semantics (window lag +
    gap-cumsum) — all sessions are 'closed' in batch."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # cast('double') keeps fractional seconds: the long cast truncated
    # to whole seconds, silently merging sessions whose gap exceeded
    # `gap_seconds` by less than a second — and disagreeing with the
    # stream operator, which compares in microseconds. Epoch
    # microseconds are exactly representable in a double, so the
    # comparison is exact in every engine.
    with_gap = events.withColumn(
        "new_session",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double"), 1, 0).over(w)
            > gap_seconds
        ).cast("int"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        with_gap.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("session_id")
    )
