"""Bucketed-table co-location: the plan-level proof behind every
"pre-bucket by key at 10^12 rows" note in the ops docstrings
(ops/graph.py, ops/incremental_dedup.py, sources/bucketed.py)."""

import pytest

from kenlm_rs_spark.sources.bucketed import cobucketed_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    left = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "id % 7 AS feature"
    )
    right = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "CAST(id * 3 AS DOUBLE) AS score"
    )
    write_bucketed(left, "bt_left", "doc_id", buckets=4)
    write_bucketed(right, "bt_right", "doc_id", buckets=4)
    yield "bt_left", "bt_right"
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    out = cobucketed_join(spark, lt, rt, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: scans satisfy partitioning
    assert out.count() == 1000


def test_cobucketed_join_sort_elided_with_output_ordering(spark, bucketed_pair):
    # Spark >= 3.0 ignores sortBy metadata on read by default (SPARK-28632:
    # >1 file per bucket would need a merge); write_bucketed guarantees ONE
    # file per bucket, so the legacy conf soundly elides the per-side Sort.
    lt, rt = bucketed_pair
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(key, "true")
    try:
        plan = (
            cobucketed_join(spark, lt, rt, "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(key, "false")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Sort" not in plan.replace("SortMergeJoin", "SMJ")


def test_cobucketed_join_values(spark, bucketed_pair):
    lt, rt = bucketed_pair
    rows = {
        r["doc_id"]: (r["feature"], r["score"])
        for r in cobucketed_join(spark, lt, rt, "doc_id").collect()
    }
    assert rows[10] == (3, 30.0)
    assert rows[999] == (999 % 7, 2997.0)


def test_unbucketed_same_join_shuffles(spark, bucketed_pair):
    # control: the identical join over plain (unbucketed) frames DOES carry
    # an Exchange on each side — proving the assertion above is the
    # bucketing, not a quirk of the tiny input.
    left = spark.table(bucketed_pair[0]).hint("SHUFFLE_MERGE")
    right = (
        spark.range(0, 1000)
        .selectExpr("id AS doc_id", "CAST(id * 3 AS DOUBLE) AS score")
        .hint("SHUFFLE_MERGE")
    )
    plan = (
        left.join(right, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan


def test_write_bucketed_validation(spark):
    df = spark.range(3).selectExpr("id AS doc_id")
    with pytest.raises(ValueError, match="buckets"):
        write_bucketed(df, "bt_bad", "doc_id", buckets=0)
