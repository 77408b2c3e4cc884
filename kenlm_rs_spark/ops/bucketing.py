"""Bucketed co-located joins — the shuffle-free join strategy for repeated
big-big joins at 100 TB scale (SURVEY.md §1.3 partitioning notes).

When the same join key is used across many pipeline runs (e.g. n-gram tables
joined on the suffix every estimation round, or document tables joined on
doc_id by every dedup pass), writing both sides bucketed by that key lets
every subsequent sort-merge join skip its Exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 16,
    sorted_by: str | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sorted_by:
        w = w.sortBy(sorted_by)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a sort-merge join with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_shuffle(df: DataFrame) -> bool:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return "Exchange" in plan
