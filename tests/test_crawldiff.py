"""Crawl-snapshot diff (ops/crawldiff.py): four-way classification, the
summary report, and the incremental frontier (added+changed only)."""

from pyspark.sql import functions as F

from kenlm_rs_spark.ops.crawldiff import (
    crawl_diff,
    crawl_diff_summary,
    incremental_frontier,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_four_way_classification(spark):
    old = _snap(
        spark,
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")],
    )
    new = _snap(
        spark,
        [("u1", "h1"), ("u2", "h2-v2"), ("u4", "h4")],
    )
    got = {
        r["url"]: r["status"] for r in crawl_diff(old, new).collect()
    }
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
    }


def test_summary_and_frontier(spark):
    old = _snap(spark, [("a", "1"), ("b", "2"), ("c", "3")])
    new = _snap(spark, [("a", "1"), ("b", "x"), ("d", "9")])
    diff = crawl_diff(old, new)
    summary = {r["status"]: r["n_urls"] for r in crawl_diff_summary(diff).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}
    frontier = sorted(
        (r["url"], r["new_hash"]) for r in incremental_frontier(diff).collect()
    )
    assert frontier == [("b", "x"), ("d", "9")]


def test_diff_against_self_is_all_unchanged(spark):
    snap = _snap(spark, [(f"u{i}", f"h{i}") for i in range(20)])
    diff = crawl_diff(snap, snap)
    assert diff.filter(F.col("status") != "unchanged").count() == 0
    assert diff.count() == 20
