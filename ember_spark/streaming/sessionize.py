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
                ts_list.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
                vals.extend(float(v) for v in pdf["value"])
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
    with_gap = events.withColumn(
        "new_session",
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1, 0).over(w)
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
