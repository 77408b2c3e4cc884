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


def sessionize_batch_skew(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: int = SESSION_GAP_SEC,
    bucket_sec: int = 86400,
) -> DataFrame:
    """Skew-safe twin of sessionize_batch: identical output, but no window
    ever partitions by the raw user alone, so one mega-user (100M events at
    web scale) cannot serialize into a single task.

    Two-phase shape:
    1. events window-partition by (user, time-bucket) — per-task group size
       is bounded by the user's events per ``bucket_sec``, not their total;
    2. the only cross-bucket facts (previous bucket's last event epoch, and
       the running count of session starts in prior buckets) come from
       per-(user, bucket) aggregates — a table with one row per user-bucket —
       so the per-user windows run over bucket counts, not event counts.

    The residual caveat is burst skew: a user whose events all land in ONE
    bucket still serializes that bucket; pick ``bucket_sec`` against the
    expected per-user event density (the same lever as salt count in
    ops/partitioning.py)."""
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    e = events.withColumn("_epoch", epoch).withColumn(
        "_bkt", F.floor(F.col("_epoch") / F.lit(bucket_sec))
    )
    wb = Window.partitionBy(user_col, "_bkt").orderBy(ts_col)
    wu = Window.partitionBy(user_col).orderBy("_bkt")

    # one row per (user, bucket): last event epoch -> next bucket's carry-in
    bstats = (
        e.groupBy(user_col, "_bkt")
        .agg(F.max("_epoch").alias("_last"))
        .withColumn("_prev_last", F.lag("_last").over(wu))
        .drop("_last")
    )
    e = e.join(bstats, [user_col, "_bkt"])
    gap = F.col("_epoch") - F.coalesce(
        F.lag("_epoch").over(wb), F.col("_prev_last")
    )
    e = e.withColumn(
        "_flag", F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    ).withColumn("_local", F.sum("_flag").over(wb))

    # running count of session starts in PRIOR buckets (per-user window over
    # the bucket-aggregate table again)
    btot = (
        e.groupBy(user_col, "_bkt")
        .agg(F.sum("_flag").alias("_bflags"))
        .withColumn(
            "_cum_prev",
            F.coalesce(
                F.sum("_bflags").over(
                    wu.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(user_col, "_bkt", "_cum_prev")
    )
    e = e.join(btot, [user_col, "_bkt"]).withColumn(
        "session_id", F.col("_local") + F.col("_cum_prev")
    )
    return (
        e.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
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

    def utc_naive(epoch):
        # explicit-UTC construction: naive fromtimestamp() uses the
        # executor's LOCAL tz and would shift session bounds on non-UTC
        # workers (pandas reads naive timestamps back as UTC, so the
        # round-trip must be UTC on both legs)
        return dt.datetime.fromtimestamp(epoch, tz=dt.timezone.utc).replace(tzinfo=None)

    (user_id,) = key
    if state.hasTimedOut:
        (start, last, n, total) = state.get
        state.remove()
        yield pd.DataFrame(
            [
                dict(
                    user_id=user_id,
                    session_start=utc_naive(start),
                    session_end=utc_naive(last),
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
                    session_start=utc_naive(start),
                    session_end=utc_naive(last),
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
        # float64 accumulation (the batch twin sums DECIMAL): fine for the
        # stream==batch equivalence fixture's value range, not bit-law
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
