"""Stateful streaming sessionization vs its exact batch twin."""

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

BASE = datetime(2023, 1, 1, 0, 0, 0)


def _mk_events(spark):
    rows = []
    eid = 0
    for user in (1, 2, 3):
        # session A: 3 events 10s apart; session B (after 2h): 2 events;
        # flush event far in the future closes B through the gap logic
        for k in range(3):
            rows.append((eid, BASE + timedelta(seconds=10 * k + user), user))
            eid += 1
        for k in range(2):
            rows.append(
                (eid, BASE + timedelta(hours=2, seconds=15 * k + user), user)
            )
            eid += 1
        rows.append((eid, BASE + timedelta(days=2), user))
        eid += 1
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    )


def test_batch_sessionization(spark):
    from osmptparser_spark.streaming.sessions import sessionize_batch

    ev = _mk_events(spark)
    got = sessionize_batch(ev, gap_seconds=1800).collect()
    per_user = {}
    for r in got:
        per_user.setdefault(r.user_id, []).append((r.session_start, r.n_events))
    for u in (1, 2, 3):
        sessions = sorted(per_user[u])
        assert [n for _, n in sessions] == [3, 2, 1]


def test_streaming_matches_batch_closed_sessions(spark, tmp_path):
    from osmptparser_spark.streaming.sessions import sessionize_batch, sessionize_stream

    ev = _mk_events(spark)
    src = str(tmp_path / "sess_src")
    # one file per trigger so the watermark advances between batches
    ev.orderBy("ts").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("select * from sessions_out").collect()
        }
    finally:
        q.stop()
    batch = sessionize_batch(ev, gap_seconds=1800).collect()
    # the last (flush) session per user never closes in the stream
    last_start = {}
    for r in batch:
        if r.user_id not in last_start or r.session_start > last_start[r.user_id]:
            last_start[r.user_id] = r.session_start
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch
        if r.session_start != last_start[r.user_id]
    }
    assert got == want
    assert len(want) == 6  # 2 closed sessions x 3 users
