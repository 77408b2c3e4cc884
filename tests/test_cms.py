"""Count-min sketch (ops/cms.py): one-sided error (estimate >= truth),
exactness when w is ample, weighted increments, linear mergeability, and
unseen keys estimating 0."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.cms import cms_build, cms_estimate

W, D = 512, 4


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: key-0 x 64, key-1 x 32, ..., key-6 x 1
    rows = []
    for i in range(7):
        rows += [(f"key-{i}",)] * (64 >> i)
    return spark.createDataFrame(rows, "key string")


def test_one_sided_and_exact_when_ample(spark, stream):
    sketch = cms_build(stream, "key", width=W, depth=D)
    truth = {
        r["key"]: r["n"]
        for r in stream.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    queries = stream.select("key").distinct()
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_estimate(queries, sketch, "key", width=W, depth=D).collect()
    }
    assert set(est) == set(truth)
    for k, n in truth.items():
        assert est[k] >= n  # never undercounts
    # 7 keys x 4 cells into 512*4: collisions essentially impossible
    assert est == truth


def test_unseen_key_estimates_zero_without_collision(spark, stream):
    sketch = cms_build(stream, "key", width=W, depth=D)
    q = spark.createDataFrame([("never-seen-key-xyz",)], "key string")
    est = cms_estimate(q, sketch, "key", width=W, depth=D).collect()[0]
    assert est["cms_estimate"] == 0


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], "key string, w long"
    )
    sketch = cms_build(df, "key", width=W, depth=D, weight_col="w")
    q = df.select("key").distinct()
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_estimate(q, sketch, "key", width=W, depth=D).collect()
    }
    assert est == {"a": 15, "b": 7}


def test_sketch_merge_is_cell_sum(spark, stream):
    """CMS is linear: sketch(A ∪ B) == cell-wise sum of sketches."""
    rows = [(f"key-{i}",) for i in range(7) for _ in range(64 >> i)]
    a = spark.createDataFrame(rows[:40], "key string")
    b = spark.createDataFrame(rows[40:], "key string")
    sa = cms_build(a, "key", width=W, depth=D)
    sb = cms_build(b, "key", width=W, depth=D)
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_build(stream, "key", width=W, depth=D)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_validation(spark, stream):
    with pytest.raises(ValueError):
        cms_build(stream, "key", width=0)
