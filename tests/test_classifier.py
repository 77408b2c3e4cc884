"""The frozen linear quality classifier must reproduce from its
deterministic training pipeline (same discipline as the frozen lmplz ARPA
bytes), and its distillation quality vs the full-pipeline labels must hold."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_frozen_weights_reproduce_and_f1(spark):
    if not os.path.exists(
        os.path.join(REPO, "fixtures", "expected", "expected.parquet")
    ):
        pytest.skip("expected fixtures not frozen")
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from train_quality_classifier import train, training_frame

    from kenlm_rs_spark.pipeline.classifier import BIAS, FEATURES, MU, SD, WEIGHTS

    X, y, names = training_frame(spark)
    consts = train(X, y, names)
    assert names == FEATURES
    assert consts["MU"] == MU, "training no longer reproduces frozen MU"
    assert consts["SD"] == SD
    assert consts["WEIGHTS"] == WEIGHTS
    assert consts["BIAS"] == BIAS
    # the cheap classifier must keep approximating the full decision
    assert consts["metrics"]["f1"] >= 0.84, consts["metrics"]


def test_classifier_expression_matches_numpy(spark):
    """The Catalyst logit must equal the straight numpy computation of the
    same frozen constants on a handful of crafted docs."""
    import numpy as np
    from pyspark.sql import functions as F

    from kenlm_rs_spark.pipeline.classifier import (
        BIAS,
        FEATURES,
        MU,
        SD,
        WEIGHTS,
        classifier_score_col,
        feature_cols,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "$$ %% ## !! 123 456 789 000 111"),
            (3, "a a a a a a a a a a a a"),
            (4, "plain short text"),
        ],
        "doc_id long, text string",
    )
    t = F.col("text")
    f = feature_cols(t)
    rows = docs.select(
        "doc_id",
        classifier_score_col(t).alias("z"),
        *[f[n].alias(n) for n in FEATURES],
    ).collect()
    for r in rows:
        z = BIAS + sum(
            WEIGHTS[n] * ((float(r[n]) - MU[n]) / SD[n]) for n in FEATURES
        )
        assert r["z"] == pytest.approx(z, abs=1e-9), r["doc_id"]
