"""Hash-bucketed table sink for shuffle-free co-located equi-joins.

At 100 TB the dominant cost of every key-equi join (URL-dedup verify,
link-graph iterations, incremental cross-snapshot dedup, n-gram suffix
joins) is shuffling the fact table. Spark bucketed tables
(``DataFrameWriter.bucketBy`` + ``saveAsTable``) persist data already
hash-partitioned on the join key: two tables bucketed by the same key with
the same bucket count join with NO Exchange on either side — the scan
itself satisfies the required HashPartitioning. The SortMergeJoin's
per-side Sort remains by default (Spark >= 3.0 ignores sortBy metadata on
read, SPARK-28632, because >1 file per bucket would need a merge); since
``write_bucketed`` guarantees one file per bucket, setting
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` soundly elides
it — a per-partition sort is a bounded, spill-safe cost either way; the
shuffle is the scale-killer and it is gone. tests/test_bucketing.py
asserts both plan shapes.

This is the Spark-native analogue of the reference builder keeping n-gram
streams in suffix/context order across pipeline passes so downstream
stages never re-sort (/root/reference/src/cxx/lm/builder/sort.hh — the
chain hands sorted blocks between steps by contract, not by re-sorting).

Bucket-count sizing at the design point: target <= ~128 MB of compressed
data per bucket file so one bucket is one healthy task input
(buckets >= table_bytes / 128 MB / files_per_writer_task); keep it a power
of two so a later 2x rescale still aligns pairwise. Both tables of a
recurring join MUST agree on (key, bucket count) — that contract is the
caller's, recorded in the table properties we set here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a managed table hash-bucketed (and by default
    sorted) on ``key``. Joins between tables written with the same
    (key, buckets) are Exchange-free."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    # one shuffle at write time buys every later join: co-partitioning the
    # writer tasks with the bucket function means ONE file per bucket
    # instead of tasks x buckets small files (the classic bucketed-sink
    # file explosion), and preserves the sortBy guarantee on read (Spark
    # only trusts per-bucket order for single-file buckets)
    w = (
        df.repartition(buckets, key)
        .write.format(format)
        .mode(mode)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on ``key`` without a shuffle.

    The SHUFFLE_MERGE hint pins a sort-merge join for THIS join only (a
    small-table broadcast would hide — not break — the co-location; at
    100 TB neither side fits the driver, so the plan must stand on
    bucketing alone), leaving the session's autoBroadcastJoinThreshold
    untouched. On bucketed+sorted inputs the SMJ needs neither Exchange
    nor Sort.
    """
    left = spark.table(left_table).hint("SHUFFLE_MERGE")
    right = spark.table(right_table).hint("SHUFFLE_MERGE")
    return left.join(right, key, how)
