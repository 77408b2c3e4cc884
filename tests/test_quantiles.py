"""Histogram quantiles (ops/quantiles.py): hand-computed ranks, bin-width
error bound vs exact percentiles, mergeability, grouped independence."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.quantiles import (
    histogram_bins,
    histogram_quantiles,
    quantiles_of,
)


def test_hand_computed_median(spark):
    # values 1..10, width 1: bins=values; median rank ceil(10/2)=5 -> bin 5
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    out = quantiles_of(df, "v", [(1, 2)], bin_width=1).collect()
    assert len(out) == 1
    assert out[0]["quantile"] == 5.0


def test_error_bounded_by_bin_width(spark):
    vals = [float(i) for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for num, den, exact in [(1, 4, 250.0), (1, 2, 500.0), (3, 4, 750.0)]:
        got = (
            quantiles_of(df, "v", [(num, den)], bin_width=8)
            .collect()[0]["quantile"]
        )
        assert abs(got - exact) <= 8.0, (num, den, got)


def test_merge_then_rank_equals_whole(spark):
    df = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(500)], "i long, v double"
    ).select("v", "i")
    a = histogram_bins(df.filter(F.col("i") % 2 == 0), "v", 4)
    b = histogram_bins(df.filter(F.col("i") % 2 == 1), "v", 4)
    merged = (
        a.unionByName(b).groupBy("bin").agg(F.sum("n").cast("long").alias("n"))
    )
    whole = histogram_bins(df, "v", 4)
    q_m = histogram_quantiles(merged, [(1, 2)], 4).collect()[0]["quantile"]
    q_w = histogram_quantiles(whole, [(1, 2)], 4).collect()[0]["quantile"]
    assert q_m == q_w


def test_grouped_and_negative_values(spark):
    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(-i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"]): r["quantile"]
        for r in quantiles_of(df, "v", [(1, 2)], 2, ["g"]).collect()
    }
    assert got["a"] >= 0 and got["b"] <= -40.0


def test_bad_prob_rejected(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="rational"):
        quantiles_of(df, "v", [(1, 0)], 1)
    with pytest.raises(ValueError, match="rational"):
        quantiles_of(df, "v", [(3, 2)], 1)
