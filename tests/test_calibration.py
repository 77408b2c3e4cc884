"""Calibration report (ops/calibration.py): hand-computed bins/rates,
clamping of out-of-range scores, well-calibrated-vs-folded shapes, and
validation."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.calibration import (
    calibration_bin_sql_expr,
    calibration_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


def test_hand_bins_and_rates(spark):
    rows = [
        (-9.5, False), (-9.0, False),            # bin 0
        (0.5, True), (1.5, False), (0.1, True),  # bin 5
        (9.9, True),                             # bin 9
    ]
    out = {r["bin"]: r for r in calibration_report(_df(spark, rows)).collect()}
    assert set(out) == {0, 5, 9}
    assert (out[0]["n"], out[0]["n_keep"], out[0]["keep_rate"]) == (2, 0, 0.0)
    assert out[0]["bin_lo"] == -10.0 and out[5]["bin_lo"] == 0.0
    assert out[5]["n"] == 3 and out[5]["keep_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[5]["mean_score"] == pytest.approx((0.5 + 1.5 + 0.1) / 3, abs=1e-6)
    assert out[9]["keep_rate"] == 1.0


def test_out_of_range_clamped_to_edge_bins(spark):
    rows = [(-50.0, False), (-10.0, False), (9.999999, True), (50.0, True)]
    out = {r["bin"]: r for r in calibration_report(_df(spark, rows)).collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 2 and out[9]["n"] == 2


def test_monotone_curve_for_calibrated_model(spark):
    # label = score >= 0 (a bin edge) -> keep_rate must be a step:
    # 0 below, 1 at and above
    rows = [(float(s), s >= 0) for s in range(-9, 10)]
    out = calibration_report(_df(spark, rows)).collect()
    for r in out:
        assert r["keep_rate"] in (0.0, 1.0)
        assert (r["keep_rate"] == 1.0) == (r["bin_lo"] >= 0.0)


def test_sql_expr_shared_text_and_validation(spark):
    # the Spark plan executes the same expression text DuckDB would
    expr = calibration_bin_sql_expr("score", -10.0, 2.0, 10)
    assert "least(9" in expr and "floor" in expr
    import duckdb

    assert duckdb.sql(f"SELECT {expr} AS b FROM (SELECT 3.7 AS score)").fetchone()[0] == 6
    df = _df(spark, [(0.0, True)])
    with pytest.raises(ValueError):
        calibration_report(df, n_bins=1)
    with pytest.raises(ValueError):
        calibration_report(df, width=0.0)
