"""Streaming URL dedup: first occurrence per canonical URL across
micro-batches equals the batch stage when the data arrives in one batch."""

import datetime as dt
import os
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


def _pages(spark):
    base = dt.datetime(2025, 4, 1)
    rows = []
    for i in range(30):
        page = i // 3
        # three crawls of every page: canonical + utm + fragment variants
        variant = ["", "?utm_source=x", "#frag"][i % 3]
        rows.append(
            (
                f"https://s{page}.example.com/p{page}{variant}",
                base + dt.timedelta(hours=i),
            )
        )
    return spark.createDataFrame(rows, "url string, warc_ts timestamp")


def test_stream_dedup_equals_batch_single_batch(spark, tmp_path):
    from kenlm_rs_spark.ops.urls import url_dedup
    from kenlm_rs_spark.streaming.url_dedup import url_dedup_stream

    ev = _pages(spark)
    n = ev.count()
    in_dir = str(tmp_path / "in")
    ev.write.parquet(in_dir)

    stream = spark.readStream.schema("url string, warc_ts timestamp").parquet(in_dir)
    q = (
        url_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("url_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_and_stop(q, n)
    got = {
        (r["canon_url"], r["url"])
        for r in spark.sql("SELECT * FROM url_dedup_out").collect()
    }
    # exact batch-policy twin: earliest (warc_ts, url) per canonical URL
    from kenlm_rs_spark.ops.urls import canonical_url

    rows = ev.select(
        canonical_url(F.col("url")).alias("c"), "url", "warc_ts"
    ).collect()
    first = {}
    for r in rows:
        key = (r["warc_ts"], r["url"])
        if r["c"] not in first or key < first[r["c"]]:
            first[r["c"]] = key
    want = {(c, u) for c, (_, u) in first.items()}
    assert got == want
    assert len(got) == 10
    # sanity on url_dedup's batch flag too: 10 canonical survivors
    batch = url_dedup(
        ev.withColumn("doc_id", F.unix_timestamp("warc_ts")), id_col="doc_id"
    )
    assert batch.filter("is_canonical").count() == 10


def test_stream_dedup_drops_across_batches(spark, tmp_path):
    """A re-crawl arriving in a LATER micro-batch is dropped by state (the
    file-stream source with maxFilesPerTrigger=1 forces separate batches)."""
    from kenlm_rs_spark.streaming.url_dedup import url_dedup_stream

    base = dt.datetime(2025, 4, 1)
    in_dir = str(tmp_path / "in2")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [("https://a.example.com/x", base)], "url string, warc_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(
        [
            ("https://a.example.com/x?utm_source=y", base + dt.timedelta(days=1)),
            ("https://b.example.com/y", base),
        ],
        "url string, warc_ts timestamp",
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        url_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("url_dedup_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_and_stop(q, 3)
    got = sorted(
        r["url"] for r in spark.sql("SELECT * FROM url_dedup_out2").collect()
    )
    # the utm re-crawl was dropped by cross-batch state; b emitted
    assert got == ["https://a.example.com/x", "https://b.example.com/y"]
