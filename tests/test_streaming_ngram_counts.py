"""Streaming n-gram counting: running state across micro-batches equals
the batch CorpusCount on the same input (update output mode, last update
per gram wins)."""

import time


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


def test_stream_ngram_counts_equal_batch(spark, tmp_path):
    import os

    from kenlm_rs_spark.streaming.ngram_counts import ngram_count_stream

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # two files -> with maxFilesPerTrigger=1, counts must ACCUMULATE across
    # micro-batches through the state store ("a b c" appears in both)
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [(3, "a b c"), (4, "b c d e")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(in_dir)

    batch = spark.read.parquet(in_dir)
    want = {
        (r["ngram"], r["cnt"])
        for r in ngram_count_stream(batch, n=3).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        ngram_count_stream(stream, n=3)
        .writeStream.format("memory")
        .queryName("ngram_counts_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain_and_stop(q, 4)
    got = {
        (r["ngram"], r["cnt"])
        for r in spark.sql("SELECT * FROM ngram_counts_out").collect()
    }
    assert got == want
    # the cross-batch gram accumulated: "a b c" total 2 only via state
    assert ("a b c", 2) in got
