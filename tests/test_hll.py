"""HyperLogLog (ops/hll.py): register parity vs the Python twin, the
lossless merge law, estimation accuracy bands, linear-counting branch on
tiny sets, and grouped estimation."""

import math

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.hll import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_merge,
    hll_registers,
    hll_rho_py,
)


@pytest.fixture(scope="module")
def values(spark):
    return spark.createDataFrame(
        [(f"value-{i}",) for i in range(5000)], "v string"
    )


def test_registers_match_python_twin(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(200)], "v string")
    regs = {
        (r["bucket"], ): r["rho"]
        for r in hll_registers(df, "v").collect()
    }
    expected = {}
    for i in range(200):
        b, rho = hll_rho_py(f"x{i}")
        expected[(b,)] = max(expected.get((b,), 0), rho)
    assert regs == expected


def test_estimate_within_hll_error_band(spark, values):
    # m=256 -> relative standard error 1.04/sqrt(256) = 6.5%; 4 sigma band.
    est = hll_distinct(values, "v").collect()[0]["hll_estimate"]
    assert abs(est - 5000) / 5000 < 4 * 1.04 / math.sqrt(256)


def test_merge_law_lossless(spark, values):
    # sketch(A) merge sketch(B) == sketch(A union B), register-exact —
    # the checkpointable-artifact property the module exists for.
    a = values.filter(F.col("v") < "value-3")
    b = values.filter(F.col("v") >= "value-3")
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    whole = hll_registers(values, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    est_m = hll_estimate_from_registers(merged).collect()[0]["hll_estimate"]
    est_w = hll_estimate_from_registers(whole).collect()[0]["hll_estimate"]
    assert est_m == est_w


def test_linear_counting_small_set(spark):
    # 10 distinct values: raw estimate is far below 2.5m with empty
    # registers -> the m*ln(m/V) branch; expect near-exact.
    df = spark.createDataFrame([(f"s{i % 10}",) for i in range(100)], "v string")
    row = hll_distinct(df, "v").collect()[0]
    assert row["v_empty"] >= 246
    assert abs(row["hll_estimate"] - 10) < 1.0


def test_grouped_estimation_independent(spark):
    rows = [("a", f"v{i}") for i in range(1000)] + [
        ("b", f"v{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        r["g"]: r["hll_estimate"]
        for r in hll_distinct(df, "v", group_cols=["g"]).collect()
    }
    # group b is small enough for linear counting; group a inside 4 sigma
    assert abs(got["b"] - 50) / 50 < 0.15
    assert abs(got["a"] - 1000) / 1000 < 4 * 1.04 / math.sqrt(256)
