"""Streaming quality filter: stream == batch exactly (the chain is a
stateless map once thresholds are pre-fitted, so no relaxation at all)."""

import time

from pyspark.sql import functions as F


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


def test_stream_filter_equals_batch(spark, tmp_path):
    from kenlm_rs_spark.pipeline.quality import ppl_thresholds
    from kenlm_rs_spark.spark.scoring import broadcast_model
    from kenlm_rs_spark.streaming.filter_stream import filter_stream

    bc = broadcast_model(spark, "fixtures/lms/en.arpa")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", F.col("lang").alias("lang_pred"))
    )
    in_dir = str(tmp_path / "in")
    docs.write.parquet(in_dir)
    n = docs.count()

    # thresholds are fit OFFLINE on the batch snapshot (production shape),
    # then applied identically to the batch df and the stream
    batch_scored = filter_stream(docs, bc, {})  # bucket-free pass for ppl
    thr = ppl_thresholds(batch_scored, lang_col="lang_pred", ppl_col="ppl")
    want = {tuple(r) for r in filter_stream(docs, bc, thr).collect()}

    stream = spark.readStream.schema(
        "doc_id long, text string, lang_pred string"
    ).parquet(in_dir)
    q = (
        filter_stream(stream, bc, thr)
        .writeStream.format("memory")
        .queryName("filter_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_and_stop(q, n)
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM filter_stream_out").collect()
    }
    assert got == want
    assert len(got) == n
    # every decision column is populated the same way batch populates it
    kept = sum(1 for r in got if r[6])
    assert 0 < kept < n
