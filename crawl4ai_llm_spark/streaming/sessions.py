"""Custom stateful streaming: sessionization via applyInPandasWithState.

The batch sessionizer (queries.q_sessionize) is a window expression; the
streaming version cannot see a user's whole history, so it keeps per-user
state (current session start/end/count) across microbatches and EMITS a
session when a gap > ``gap_s`` closes it. State is bounded: one row per
active user, dropped via processing-time timeout.

This is the applyInPandasWithState shape the engine uses for any custom
stateful operator (the reference has none — SURVEY §2.6 flags streaming as
ABSENT; this is engine-added capability).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch seconds
        StructField("session_end", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _sessionize_group(key, pdf_iter, state: GroupState):
    (user_id,) = key
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed: list[tuple[int, int, int, int]] = []
    # One user's microbatch can span MULTIPLE Arrow chunks (rows >
    # maxRecordsPerBatch); events are only ordered within a chunk, so
    # accumulate everything for the group and sort ONCE — per-chunk sorting
    # would split sessions at chunk boundaries. State stays bounded: this is
    # one user's events for one microbatch, not unbounded history.
    all_ts: list[int] = []
    for pdf in pdf_iter:
        all_ts.extend(int(t) for t in pdf["epoch"].tolist())
    for ts in sorted(all_ts):
        if last is None:
            start = last = ts
            n = 1
        elif ts - last > SESSION_GAP_S:
            closed.append((user_id, start, last, n))
            start = last = ts
            n = 1
        else:
            last = ts
            n += 1
    state.update((start, last, n))
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "session_start", "session_end", "n_events"])


def session_updates(events: DataFrame) -> DataFrame:
    """events stream → completed sessions (one state row per active user)."""
    with_epoch = events.select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("epoch"),
    )
    # NoTimeout here: a ProcessingTimeTimeout keeps an availableNow drain
    # alive forever waiting to fire (observed in Spark 4.1). In a long-lived
    # deployment, idle-user state GC would use EventTimeTimeout with a
    # watermark on ts instead.
    return with_epoch.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_append(result: DataFrame, checkpoint_dir: str) -> list:
    query = (
        result.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = result.sparkSession.sql("select * from sessions_out").collect()
    query.stop()
    return rows
