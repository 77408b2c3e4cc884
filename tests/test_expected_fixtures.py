"""North-rule gates against the frozen reference labels (FIXTURES.md §4):
keep/drop F1 >= 0.99 and byte-identical scrubbed text per url."""

import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECTED = os.path.join(REPO, "fixtures", "expected", "expected.parquet")


@pytest.fixture(scope="module")
def rerun_vs_expected(spark):
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from freeze_expected import build_expected

    got = build_expected(spark).withColumnRenamed("keep", "keep_got")
    exp = spark.read.parquet(EXPECTED)
    joined = exp.join(
        got.select(
            "url",
            "keep_got",
            F.col("scrubbed_sha256").alias("scrubbed_got"),
            F.col("extracted_sha256").alias("extracted_got"),
            F.col("bucket").alias("bucket_got"),
            F.col("lang_pred").alias("lang_got"),
        ),
        "url",
        "inner",
    ).cache()
    assert joined.count() == exp.count() == 1000
    return joined


def test_keep_drop_f1(rerun_vs_expected):
    j = rerun_vs_expected
    tp = j.filter("keep and keep_got").count()
    fp = j.filter("not keep and keep_got").count()
    fn = j.filter("keep and not keep_got").count()
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} (tp={tp} fp={fp} fn={fn})"


def test_scrubbed_text_byte_identical(rerun_vs_expected):
    j = rerun_vs_expected
    assert j.filter("scrubbed_sha256 != scrubbed_got").count() == 0
    assert j.filter("extracted_sha256 != extracted_got").count() == 0


def test_language_and_bucket_stable(rerun_vs_expected):
    j = rerun_vs_expected
    assert j.filter("lang_pred != lang_got").count() == 0
    assert j.filter("bucket != bucket_got").count() == 0
