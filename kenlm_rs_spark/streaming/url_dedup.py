"""Streaming URL-level dedup: drop re-crawls of an already-seen canonical
URL across micro-batches — the ingest-time twin of the batch
``ops/urls.url_dedup`` / filter-job early-drop stage.

Shape: ``applyInPandasWithState`` keyed by the CANONICAL url (the state key
co-locates every variant of a page on one partition, exactly like the batch
job's canonical-url chunking). State per key is a single row (first-seen
warc_ts + url), so state size is #distinct-pages, not #crawls; a state TTL
(``ttl_sec``) expires keys so unbounded crawls do not grow state forever —
the standard trade-off (a re-crawl later than the TTL is emitted again,
i.e. TTL bounds the dedup window, like a watermark bounds lateness).

Policy: first occurrence by ARRIVAL (micro-batch) order; within one
micro-batch, ties break to the earliest (warc_ts, url) — identical to the
batch stage's earliest-crawl-wins when the data arrives in one batch
(pinned by the stream==batch test). Append mode cannot retract an emitted
row, so an earlier-timestamped re-crawl arriving in a LATER batch is
dropped as a duplicate rather than replacing the emitted first — the
documented streaming relaxation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..ops.urls import canonical_url

URL_DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
    ]
)
# first-seen (epoch micros, url) per canonical url
URL_DEDUP_STATE_SCHEMA = StructType(
    [StructField("first_us", LongType()), StructField("first_url", StringType())]
)


def _first_seen_fn(ttl_sec: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        (canon,) = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdf_iter)).sort_values(["warc_ts", "url"])
        if not state.exists:
            # unseen key: the batch's earliest (warc_ts, url) is THE first
            # occurrence — emit it, remember it; everything else is a dup
            first = rows.iloc[0]
            state.update(
                (int(first["warc_ts"].value // 1_000), str(first["url"]))
            )
            yield pd.DataFrame(
                [
                    dict(
                        canon_url=canon,
                        url=first["url"],
                        warc_ts=first["warc_ts"],
                    )
                ]
            )
        # seen key: every row in this batch is a duplicate -> emit nothing
        state.setTimeoutDuration(ttl_sec * 1000)

    return fn


def url_dedup_stream(pages_stream: DataFrame, ttl_sec: int = 24 * 3600) -> DataFrame:
    """First occurrence per canonical URL across micro-batches; later
    re-crawls within the TTL window are dropped."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages_stream.withColumn("canon_url", canonical_url(F.col("url")))
    return keyed.groupBy("canon_url").applyInPandasWithState(
        _first_seen_fn(ttl_sec),
        outputStructType=URL_DEDUP_OUTPUT_SCHEMA,
        stateStructType=URL_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
