"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (the Structured Streaming pattern for operators
the built-in windows can't express — SURVEY.md §2.10 scope note; the batch
analog is kgforge.queries.q_sessionize).

Sessions close when event-time advances past ``gap_sec`` of inactivity
(event-time timeout keyed by watermark); open sessions persist in the
state store across micro-batches and across AvailableNow restarts."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_OUTPUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)

# state: [session_start_epoch, last_ts_epoch, n_events]
STATE_DDL = "session_start long, last_ts long, n_events long"


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame], state, gap_sec: int):
    import datetime

    (user_id,) = key
    if state.hasTimedOut:
        session_start, last_ts, n_events = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [
                    datetime.datetime.utcfromtimestamp(session_start)
                ],
                "session_end": [datetime.datetime.utcfromtimestamp(last_ts)],
                "n_events": [n_events],
            }
        )
        return

    rows: list[tuple[int, int, int]] = []  # closed sessions
    if state.exists:
        session_start, last_ts, n_events = state.get
    else:
        session_start, last_ts, n_events = None, None, 0

    # drain ALL batches before sorting: a group's events may arrive across
    # several Arrow batches in arbitrary order — sorting per batch would
    # corrupt session boundaries
    all_ts: list[int] = []
    for pdf in pdfs:
        all_ts.extend(int(t) for t in pdf["ts"].astype("int64") // 10**9)
    for ts in sorted(all_ts):
        if session_start is None:
            session_start, last_ts, n_events = ts, ts, 1
        elif ts - last_ts > gap_sec:
            rows.append((session_start, last_ts, n_events))
            session_start, last_ts, n_events = ts, ts, 1
        else:
            last_ts = max(last_ts, ts)
            n_events += 1

    if session_start is not None:
        state.update((session_start, last_ts, n_events))
        state.setTimeoutTimestamp((last_ts + gap_sec) * 1000)

    if rows:
        import datetime

        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [
                    datetime.datetime.utcfromtimestamp(r[0]) for r in rows
                ],
                "session_end": [
                    datetime.datetime.utcfromtimestamp(r[1]) for r in rows
                ],
                "n_events": [r[2] for r in rows],
            }
        )


def stream_sessionize(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_sec: int = 1800,
    late_threshold: str = "1 hour",
):
    """events parquet dir (stream) → closed sessions parquet (append)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .format("parquet")
        .load(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", late_threshold)
    )

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_sec)

    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
