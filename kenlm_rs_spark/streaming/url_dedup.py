"""Streaming URL-level dedup: drop re-crawls of an already-seen canonical
URL across micro-batches — the ingest-time twin of the batch
``ops/urls.url_dedup`` / filter-job early-drop stage.

Shape: ``applyInPandasWithState`` keyed by the CANONICAL url (the state key
co-locates every variant of a page on one partition, exactly like the batch
job's canonical-url chunking). State per key is a single row (first-seen
warc_ts + url), so state size is #distinct-pages, not #crawls; a state TTL
(``ttl_sec``) expires keys so unbounded crawls do not grow state forever —
the standard trade-off (a re-crawl later than the TTL is emitted again,
i.e. TTL bounds the dedup window, like a watermark bounds lateness). The
window is FIXED from first emission (the deadline is stored in state and
re-armed with the remaining time on every later batch), so even a URL
re-crawled every minute expires exactly ``ttl_sec`` after it was first
seen — state size is bounded by distinct-pages-per-TTL-window, hot keys
included.

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
# first-seen (epoch micros, url, processing-time expiry deadline ms) per
# canonical url — the deadline is fixed at first emission so the TTL window
# measures time since FIRST occurrence, not since last re-crawl (ADVICE r4:
# GroupState clears the timeout on every invocation, so a naive
# setTimeoutDuration per batch turns the TTL into a sliding since-last-seen
# window and a hot URL pins its state forever)
URL_DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType()),
        StructField("first_url", StringType()),
        StructField("deadline_ms", LongType()),
    ]
)


def _first_seen_fn(ttl_sec: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        import time as _time

        (canon,) = key
        if state.hasTimedOut:
            state.remove()
            return
        now_ms = int(_time.time() * 1000)
        rows = pd.concat(list(pdf_iter)).sort_values(["warc_ts", "url"])
        if not state.exists:
            # unseen key: the batch's earliest (warc_ts, url) is THE first
            # occurrence — emit it, remember it; everything else is a dup.
            # The expiry deadline is FIXED now, at first emission.
            first = rows.iloc[0]
            deadline_ms = now_ms + ttl_sec * 1000
            state.update(
                (
                    int(first["warc_ts"].value // 1_000),
                    str(first["url"]),
                    deadline_ms,
                )
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
        else:
            # seen key: every row in this batch is a duplicate -> emit
            # nothing. GroupState cleared the timeout when it invoked us,
            # so re-arm with the REMAINING time to the original deadline —
            # the window stays fixed from first emission no matter how
            # often the URL is re-crawled.
            deadline_ms = state.get[2]
        state.setTimeoutDuration(max(1, deadline_ms - now_ms))

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
