"""Sessionization over event streams — the custom stateful operator family.

Batch: classic gap-based sessions via window functions (lag -> new-session
flag -> running sum), fully SQL-expressible and oracle-checkable.

Streaming: the same semantics as an applyInPandasWithState operator with an
event-gap timeout — the Structured Streaming shape for operators Spark lacks
built-in (SURVEY.md §2.9 note: the reference is batch-only; this is the
engine's extension point for stateful stream processing).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SEC = 1800


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: int = SESSION_GAP_SEC,
) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events, total_value)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0),
    )
    flagged = flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return (
        flagged.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            # exact decimal addition makes the per-session sum independent of
            # summation order (double sums can flip the 6th decimal between
            # engines/partitionings); round + cast back to double afterwards
            F.round(F.sum(F.col(value_col).cast("decimal(38,9)")), 6)
            .cast("double")
            .alias("total_value"),
        )
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("closed", IntegerType()),
    ]
)


def sessionize_stateful(key, pdf_iter: Iterator[pd.DataFrame], state):
    """applyInPandasWithState function: accumulate a per-user session, emit
    closed sessions when the event gap exceeds SESSION_GAP_SEC or on state
    timeout."""
    import datetime as dt

    (user_id,) = key
    if state.hasTimedOut:
        (start, last, n, total) = state.get
        state.remove()
        yield pd.DataFrame(
            [
                dict(
                    user_id=user_id,
                    session_start=dt.datetime.fromtimestamp(start),
                    session_end=dt.datetime.fromtimestamp(last),
                    n_events=n,
                    total_value=total,
                    closed=1,
                )
            ]
        )
        return

    rows = pd.concat(list(pdf_iter)).sort_values("ts")
    out = []
    if state.exists:
        start, last, n, total = state.get
    else:
        start = last = None
        n, total = 0, 0.0
    for ts, value in zip(rows["ts"], rows["value"]):
        t = int(ts.timestamp())
        if last is not None and t - last > SESSION_GAP_SEC:
            out.append(
                dict(
                    user_id=user_id,
                    session_start=dt.datetime.fromtimestamp(start),
                    session_end=dt.datetime.fromtimestamp(last),
                    n_events=n,
                    total_value=total,
                    closed=1,
                )
            )
            start, n, total = t, 0, 0.0
        if start is None:
            start = t
        last = t
        n += 1
        total += float(value)
    state.update((start, last, n, total))
    state.setTimeoutDuration(SESSION_GAP_SEC * 1000)
    if out:
        yield pd.DataFrame(out)


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        sessionize_stateful,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
