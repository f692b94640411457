"""Custom stateful streaming operator: user sessionization via
``applyInPandasWithState`` (gap-based session windows).

The reference has no streaming at all (SURVEY.md §2.2); this is the
engine-original stateful operator a web-scale event pipeline needs:
events are grouped per user, a session closes after ``gap`` seconds of
inactivity (tracked in GroupState), and closed sessions are emitted
with start/end/count. Batch twin :func:`sessionize_batch` computes the
same sessions with window functions so streaming output is testable
against an exact oracle.
"""

from __future__ import annotations

import datetime
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT"


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization: emits a row per CLOSED session (closed
    by a later event beyond the gap, or by state timeout past the
    watermark)."""

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        out = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                out.append((user_id, start, last, n))
            state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(int(t.value // 1_000_000_000) for t in pdf["ts"])
            ts.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            for t in ts:
                if last is not None and t - last > gap_seconds:
                    out.append((user_id, start, last, n))
                    start, n = t, 0
                if start is None:
                    start = t
                last = t
                n += 1
            state.update((start, last, n))
            state.setTimeoutTimestamp(last * 1000 + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                [
                    {
                        "user_id": u,
                        "session_start": datetime.datetime.utcfromtimestamp(s),
                        "session_end": datetime.datetime.utcfromtimestamp(e),
                        "n_events": n,
                    }
                    for u, s, e, n in out
                ]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Exact batch twin: gap-based sessions via window functions (the
    classic lag/cumsum session assignment), all JVM-side."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # NTZ timestamps cannot cast straight to long under ANSI
    epoch = F.col("ts").cast("timestamp").cast("long")
    with_gap = events.select("user_id", "ts").withColumn(
        "new_session",
        (epoch - F.lag(epoch, 1).over(w) > gap_seconds).cast("int"),
    )
    with_id = with_gap.withColumn(
        "session_id",
        F.sum(F.coalesce("new_session", F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_id.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("session_id")
