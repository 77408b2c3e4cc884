"""CDX(J) capture-index source + range-coalesced fetch planning — the
access path that makes 100 TB ingestion selective instead of exhaustive.

Common-Crawl-style archives ship a capture index ("CDXJ": one line per
archived page — ``<surt-key> <timestamp14> <json>`` where the json block
carries url/mime/status/digest/length/offset/filename) that is ~3 orders
of magnitude smaller than the WARC payload bytes it describes. The
production shape for a quality-filter job is therefore: scan the INDEX,
apply the cheap predicates there (status == 200, mime == text/html,
digest-level dedup), then fetch only the selected WARC byte ranges —
never open the ~100 TB of archive the predicates would have dropped.
``coalesce_fetch_ranges`` then merges selected records that sit close
together in the same archive file into contiguous fetch spans (object
stores bill and throttle per request: thousands of 1 KB range-GETs lose
to one span-GET that over-reads a small gap), which is the classic
range-coalescing optimization every columnar reader performs.

Scale shape (100 TB): parsing is pure codegen (regexp + from_json), a
narrow projection over the index table — the corpus is never touched.
Span planning windows WITHIN one archive file (partitionBy filename,
orderBy offset): per-file record counts are bounded by the archive-file
size convention (~1 GB => tens of thousands of records), so the window
never sees corpus-scale partitions, and filename is a uniform key.

Composes with ``sources/warc.py`` (parse the fetched spans) and
``ops/crawldiff.py`` (which captures are new since the last snapshot).

Reference relation: kenlm-rs consumes pre-extracted text (corpus source,
/root/reference/src/lib.rs); the index-driven fetch plan is the
step in front of WARC ingestion that the north rule's Common-Crawl shape
implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# ``<surt> <ts14> <json>`` — surt/ts are space-free by construction; the
# json block runs to end of line.
_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"

_JSON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("status", StringType()),
        StructField("digest", StringType()),
        StructField("length", StringType()),
        StructField("offset", StringType()),
        StructField("filename", StringType()),
    ]
)


def parse_cdx(df: DataFrame, line_col: str = "line") -> DataFrame:
    """One row per well-formed CDXJ line: (surt_key, timestamp,
    url, mime, status, digest, length, offset, filename) with
    status/length/offset as BIGINT (the CC json carries them as strings).
    Malformed lines (no surt/ts/json shape) are dropped, matching lenient
    index readers."""
    line = F.col(line_col)
    parsed = df.select(
        F.regexp_extract(line, _LINE_RE, 1).alias("surt_key"),
        F.regexp_extract(line, _LINE_RE, 2).alias("timestamp"),
        F.from_json(F.regexp_extract(line, _LINE_RE, 3), _JSON_SCHEMA).alias(
            "_j"
        ),
    ).filter(F.col("surt_key") != "")
    return parsed.select(
        "surt_key",
        "timestamp",
        F.col("_j.url").alias("url"),
        F.col("_j.mime").alias("mime"),
        F.col("_j.status").cast(LongType()).alias("status"),
        F.col("_j.digest").alias("digest"),
        F.col("_j.length").cast(LongType()).alias("length"),
        F.col("_j.offset").cast(LongType()).alias("offset"),
        F.col("_j.filename").alias("filename"),
    )


def coalesce_fetch_ranges(
    selected: DataFrame, gap: int = 0, group_col: str = "filename"
) -> DataFrame:
    """(filename, span_id, span_start, span_end, span_bytes, n_records)
    — selected index records merged into contiguous byte spans per
    archive file: a new span starts where a record's offset exceeds the
    previous record's end by more than ``gap`` (span_id = running count
    of span starts, 1-based; pure integer arithmetic, shared verbatim
    with the SQL twin)."""
    if gap < 0:
        raise ValueError(f"gap must be >= 0, got {gap}")
    w = Window.partitionBy(group_col).orderBy("offset")
    prev_end = F.lag(F.col("offset") + F.col("length")).over(w)
    is_new = F.when(
        prev_end.isNull() | (F.col("offset") > prev_end + F.lit(int(gap))), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = selected.select(
        F.col(group_col).alias("filename"), "offset", "length"
    ).withColumn("span_id", F.sum(is_new).over(wc).cast("long"))
    return (
        spans.groupBy("filename", "span_id")
        .agg(
            F.min("offset").cast("long").alias("span_start"),
            F.max(F.col("offset") + F.col("length")).cast("long").alias(
                "span_end"
            ),
            F.count("*").cast("long").alias("n_records"),
        )
        .withColumn("span_bytes", (F.col("span_end") - F.col("span_start")))
    )
