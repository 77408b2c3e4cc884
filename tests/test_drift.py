"""PSI snapshot drift (ops/drift.py): zero on identical distributions,
NumPy-reference parity on a shifted corpus, monotonicity in shift size,
single-snapshot-bin finiteness, and validation."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.drift import psi_drift, snapshot_histogram


def _psi_numpy(old_vals, new_vals, bin_width):
    """Independent reference: add-1-smoothed PSI over the union bin set."""
    ob = np.asarray(old_vals) // bin_width
    nb = np.asarray(new_vals) // bin_width
    bins = sorted(set(ob.tolist()) | set(nb.tolist()))
    n_bins = len(bins)
    n_old, n_new = len(ob), len(nb)
    psi = 0.0
    for b in bins:
        p_old = (int((ob == b).sum()) + 1) / (n_old + n_bins)
        p_new = (int((nb == b).sum()) + 1) / (n_new + n_bins)
        psi += round((p_new - p_old) * math.log(p_new / p_old), 9)
    return round(psi, 6)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, v long")


def test_identical_distributions_psi_exactly_zero(spark):
    # same multiset of values in both halves -> every term is exactly 0.0
    vals = [10, 75, 75, 140, 300]
    rows = [(i, v) for i, v in enumerate(vals)] + [
        (100 + i, v) for i, v in enumerate(vals)
    ]
    out = psi_drift(
        _df(spark, rows), "v", is_new=F.col("doc_id") >= 100, bin_width=64
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_old"], r["n_new"]) == (5, 5)
    assert r["psi"] == 0.0


def test_matches_numpy_reference(spark):
    old = [(i, (i * 37) % 500) for i in range(200)]
    new = [(1000 + i, ((i * 37) % 500) + 96) for i in range(180)]  # shifted
    out = psi_drift(
        _df(spark, old + new), "v", is_new=F.col("doc_id") >= 1000, bin_width=64
    ).collect()[0]
    expect = _psi_numpy(
        [v for _, v in old], [v - 0 for _, v in new], 64
    )
    assert out["psi"] == pytest.approx(expect, abs=2e-6)
    assert out["n_bins"] >= 8 and out["psi"] > 0.1  # a real shift registers


def test_monotone_in_shift(spark):
    base = [(i, (i * 37) % 500) for i in range(200)]

    def run(shift):
        new = [(1000 + i, v + shift) for i, v in base[:200]]
        return psi_drift(
            _df(spark, base + new), "v",
            is_new=F.col("doc_id") >= 1000, bin_width=64,
        ).collect()[0]["psi"]

    assert run(0) == 0.0
    assert 0.0 < run(64) < run(192)


def test_bin_in_one_snapshot_only_finite(spark):
    # new snapshot occupies bins the old never saw; smoothing keeps terms
    # finite and the histogram carries both counts from one pass
    rows = [(0, 10), (1, 20), (100, 1000), (101, 1010)]
    hist = snapshot_histogram(
        _df(spark, rows), "v", F.col("doc_id") >= 100, 64
    ).collect()
    by_bin = {r["bin"]: (r["k_old"], r["k_new"]) for r in hist}
    assert by_bin[0] == (2, 0) and by_bin[15] == (0, 2)
    out = psi_drift(
        _df(spark, rows), "v", is_new=F.col("doc_id") >= 100, bin_width=64
    ).collect()[0]
    assert math.isfinite(out["psi"]) and out["psi"] > 0.25


def test_per_group_rows_and_validation(spark):
    rows = [(0, 10, "en"), (1, 700, "en"), (100, 10, "de"), (101, 12, "de")]
    df = spark.createDataFrame(rows, "doc_id long, v long, lang string")
    out = psi_drift(
        df, "v", is_new=F.col("doc_id") >= 100, bin_width=64,
        group_cols=["lang"],
    ).collect()
    assert sorted(r["lang"] for r in out) == ["de", "en"]
    with pytest.raises(ValueError):
        psi_drift(df, "v", is_new=F.col("doc_id") >= 100, bin_width=0)
