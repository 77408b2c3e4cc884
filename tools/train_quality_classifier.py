"""Train the frozen linear quality classifier (pipeline/classifier.py).

Deterministic end-to-end: synthetic pages seed 42 (the same 1000 pages the
frozen fixtures/expected labels were computed from), features =
classifier.feature_cols over the scrubbed extracted text (the text the
CCNet rules saw), labels = the frozen keep/drop decisions, full-batch
gradient descent with fixed steps/lr (no RNG at all — weights init at 0).

Prints the frozen-constant block for pipeline/classifier.py plus the
achieved precision/recall/F1 vs the pipeline labels.

Usage: python tools/train_quality_classifier.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = 1000
STEPS = 3000
LR = 0.5


def training_frame(spark):
    """(features ndarray [n, 6], labels ndarray [n], feature names)."""
    import numpy as np
    from pyspark.sql import functions as F

    from kenlm_rs_spark.pipeline.classifier import FEATURES, feature_cols
    from kenlm_rs_spark.pipeline.corpus import generate_pages_df
    from kenlm_rs_spark.pipeline.extract import with_extracted_text
    from kenlm_rs_spark.pipeline.scrub import scrub_text

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp_path = os.path.join(repo, "fixtures", "expected", "expected.parquet")
    labels = spark.read.parquet(exp_path).select("url", "keep")

    pages = with_extracted_text(generate_pages_df(spark, N_PAGES))
    pages = pages.withColumn("text_scrubbed", scrub_text(F.col("text")))
    f = feature_cols(F.col("text_scrubbed"))
    feats = pages.select("url", *[f[name].alias(name) for name in FEATURES])
    rows = feats.join(labels, "url").orderBy("url").collect()
    X = np.array([[float(r[name]) for name in FEATURES] for r in rows])
    y = np.array([1.0 if r["keep"] else 0.0 for r in rows])
    return X, y, FEATURES


def train(X, y, names):
    """Standardized full-batch logistic regression; returns the frozen
    constants (round-6) and the fit metrics under those ROUNDED constants
    (what inference will actually use)."""
    import numpy as np

    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(STEPS):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (Xs.T @ g) / n
        b -= LR * g.mean()

    consts = {
        "MU": {k: round(float(m), 6) for k, m in zip(names, mu)},
        "SD": {k: round(float(s), 6) for k, s in zip(names, sd)},
        "WEIGHTS": {k: round(float(v), 6) for k, v in zip(names, w)},
        "BIAS": round(float(b), 6),
    }
    # metrics under the rounded constants (inference-exact)
    mu_r = np.array([consts["MU"][k] for k in names])
    sd_r = np.array([consts["SD"][k] for k in names])
    w_r = np.array([consts["WEIGHTS"][k] for k in names])
    z = ((X - mu_r) / sd_r) @ w_r + consts["BIAS"]
    pred = z >= 0
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    consts["metrics"] = {
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "f1": round(f1, 4),
        "accuracy": round(float((pred == y).mean()), 4),
    }
    return consts


def main():
    from kenlm_rs_spark.spark.session import get_spark

    spark = get_spark("train-quality-classifier", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    X, y, names = training_frame(spark)
    consts = train(X, y, names)
    print(json.dumps(consts, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
