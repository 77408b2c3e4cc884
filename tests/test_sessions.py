"""Sessionization: batch window-function form and the applyInPandasWithState
streaming form must agree on closed sessions."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _events(spark):
    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions (gap 2h), user 2: one session
    for m in (0, 5, 10):
        rows.append((1, base + dt.timedelta(minutes=m), 1.0))
    for m in (180, 185):
        rows.append((1, base + dt.timedelta(minutes=m), 2.0))
    for m in (0, 20, 40):
        rows.append((2, base + dt.timedelta(minutes=m), 0.5))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_batch(spark):
    from kenlm_rs_spark.ops.sessions import sessionize_batch

    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in sessionize_batch(_events(spark)).collect()
    }
    assert got == {
        (1, 1): (3, 3.0),
        (1, 2): (2, 4.0),
        (2, 1): (3, 1.5),
    }


def test_sessionize_stream_stateful(spark, tmp_path):
    from kenlm_rs_spark.ops.sessions import sessionize_stream

    in_dir = str(tmp_path / "in")
    _events(spark).write.parquet(in_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(in_dir)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    # within one micro-batch, only sessions CLOSED by a later event are
    # emitted; user 1's first session closes when the gap > 30min appears
    closed = {(r["user_id"], r["n_events"], r["total_value"]) for r in rows}
    assert (1, 3, 3.0) in closed
