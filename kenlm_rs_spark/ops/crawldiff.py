"""Crawl-snapshot diffing: classify every URL across two crawl snapshots
as added / removed / changed / unchanged.

A recurring Common-Crawl-style pipeline re-crawls on a cadence; the diff
drives incremental processing (only `added`+`changed` pages re-enter the
filter/dedup/scoring chain — at a ~5%/month web change rate that is a
~20x reduction over reprocessing the full snapshot) and is itself a
quality signal (churn-heavy domains are spam-correlated). The reference
engine processes static corpora; this follows the repo's incremental
pattern (sources/table.py snapshot manifests, pipeline/filter_job.py
resumable chunks).

Scale shape (100 TB): ONE full-outer shuffle join on the canonical URL —
uniform key (path salts the domain, same argument as ops/urls.url_dedup).
Content identity travels as a fixed-width hash column (compute md5/xxhash64
at scan time), so the shuffle moves ~50 B/row, not page bodies. With both
snapshots bucketed by url (ops/bucketing.py) the join is co-located and
shuffle-free — the shape a crawl cadence pipeline should persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(url, old_hash, new_hash, status) per URL present in either
    snapshot. Hashes are compared as opaque strings; pass the same hash
    function over both snapshots (md5 of the extracted text is the
    repo-wide convention)."""
    o = old.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("old_hash")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("new_hash")
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", "old_hash", "new_hash", status.alias("status"))


def crawl_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_urls) — the cadence report row; one low-cardinality
    groupBy with map-side combine."""
    return diff.groupBy("status").agg(F.count("*").cast("long").alias("n_urls"))


def incremental_frontier(diff: DataFrame) -> DataFrame:
    """URLs that must re-enter the processing chain: added + changed."""
    return diff.filter(F.col("status").isin("added", "changed")).select(
        "url", "new_hash"
    )
