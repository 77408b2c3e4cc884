"""Streaming drift monitor (streaming/drift.py): the PSI emitted after
the final trigger equals the batch psi_drift on the concatenated
old+new corpus (shared psi_from_counts arithmetic, so equality is
exact), the monitor emits one row set per epoch, and the per-epoch
curve reacts to a shifted stream."""

import os
import time

from pyspark.sql import functions as F

from kenlm_rs_spark.ops.drift import psi_drift, snapshot_histogram
from kenlm_rs_spark.streaming.drift import (
    psi_vs_baseline,
    start_drift_monitor,
    streaming_new_counts,
)


def _drain_and_stop(q, n_input_rows: int, timeout: int = 240) -> None:
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


def _baseline(spark, vals, bin_width):
    """(bin, k_old) histogram of the blessed snapshot."""
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    return snapshot_histogram(df, "v", F.lit(False), bin_width).select(
        "bin", "k_old"
    )


def test_psi_vs_baseline_equals_batch(spark):
    """Batch-mode check of the monitor's join+PSI stage: identical to
    psi_drift on the concatenated corpus."""
    old = [(i * 37) % 500 for i in range(200)]
    new = [((i * 37) % 500) + 96 for i in range(180)]
    base = _baseline(spark, old, 64)
    new_df = spark.createDataFrame([(v,) for v in new], "v long")
    got = psi_vs_baseline(
        streaming_new_counts(new_df, "v", 64), base
    ).collect()[0]

    rows = [(i, v) for i, v in enumerate(old)] + [
        (10_000 + i, v) for i, v in enumerate(new)
    ]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    want = psi_drift(
        df, "v", is_new=F.col("doc_id") >= 10_000, bin_width=64
    ).collect()[0]
    assert (got["n_old"], got["n_new"], got["n_bins"], got["psi"]) == (
        want["n_old"],
        want["n_new"],
        want["n_bins"],
        want["psi"],
    )


def test_stream_final_epoch_equals_batch(spark, tmp_path):
    old = [(i * 37) % 500 for i in range(200)]
    new1 = [((i * 37) % 500) + 96 for i in range(90)]
    new2 = [((i * 37) % 500) + 96 for i in range(90, 180)]

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # two files -> with maxFilesPerTrigger=1 the running histogram must
    # ACCUMULATE across micro-batches through the state store
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(new1)], "doc_id long, v long"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [(90 + i, v) for i, v in enumerate(new2)], "doc_id long, v long"
    ).coalesce(1).write.mode("append").parquet(in_dir)

    base = _baseline(spark, old, 64)
    out_path = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_drift_monitor(
        stream,
        base,
        "v",
        64,
        out_path=out_path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    _drain_and_stop(q, len(new1) + len(new2))

    emitted = spark.read.parquet(out_path).collect()
    epochs = sorted({r["epoch_id"] for r in emitted})
    assert len(epochs) >= 2  # one PSI row set per trigger
    final = [r for r in emitted if r["epoch_id"] == epochs[-1]][0]

    rows = [(i, v) for i, v in enumerate(old)] + [
        (10_000 + i, v) for i, v in enumerate(new1 + new2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    want = psi_drift(
        df, "v", is_new=F.col("doc_id") >= 10_000, bin_width=64
    ).collect()[0]
    assert (final["n_old"], final["n_new"], final["n_bins"], final["psi"]) == (
        want["n_old"],
        want["n_new"],
        want["n_bins"],
        want["psi"],
    )
    # the shifted stream registers as drift on the alarm feed
    assert final["psi"] > 0.1


def test_identical_stream_psi_zero(spark, tmp_path):
    """A stream drawn from the baseline distribution alarms at exactly
    0.0 once fully drained (every smoothed term cancels bitwise)."""
    vals = [10, 75, 75, 140, 300]
    base = _baseline(spark, vals, 64)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, v long"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    out_path = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, v long").parquet(in_dir)
    q = start_drift_monitor(
        stream, base, "v", 64,
        out_path=out_path, checkpoint=str(tmp_path / "ckpt"),
    )
    _drain_and_stop(q, len(vals))
    emitted = spark.read.parquet(out_path).collect()
    final = max(emitted, key=lambda r: r["epoch_id"])
    assert final["psi"] == 0.0 and final["n_old"] == final["n_new"] == 5
