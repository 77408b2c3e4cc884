"""DSIR importance resampling (ops/dsir.py): weight spine totality,
target-likeness ordering, empty-doc handling, determinism, and the
sketch-threshold selection keeping ~the requested fraction."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.dsir import (
    dsir_scores,
    dsir_select,
    dsir_weights,
    hashed_features,
)

B = 256


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 "in-domain" docs share the target vocabulary; 160 raw docs don't
    rows = [(i, f"alpha beta gamma delta {i % 7}") for i in range(40)] + [
        (100 + i, f"zig zag zoom {i % 11} noise filler") for i in range(160)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def scored(spark, corpus):
    target = corpus.filter(F.col("doc_id") < 40)
    w = dsir_weights(corpus, target, buckets=B)
    return dsir_scores(corpus, w, buckets=B).cache()


def test_weight_spine_is_total(spark, corpus):
    w = dsir_weights(corpus, corpus.filter(F.col("doc_id") < 40), buckets=B)
    assert w.count() == B
    assert w.filter(F.col("w").isNull()).count() == 0


def test_target_like_docs_score_higher(scored):
    rows = {r["doc_id"]: r["dsir_score"] for r in scored.collect()}
    tgt = [v for k, v in rows.items() if k < 40]
    raw = [v for k, v in rows.items() if k >= 100]
    assert min(tgt) > max(raw)


def test_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "")], "doc_id long, text string"
    )
    w = dsir_weights(docs, docs.filter(F.col("doc_id") == 0), buckets=B)
    out = {r["doc_id"]: r["dsir_score"] for r in dsir_scores(docs, w, buckets=B).collect()}
    assert out[1] == 0.0 and len(out) == 2


def test_feature_multiplicity(spark):
    docs = spark.createDataFrame([(0, "a a a")], "doc_id long, text string")
    # 3 unigrams + 2 bigrams = 5 occurrences
    assert hashed_features(docs, buckets=B).count() == 5


def test_select_keeps_fraction(scored):
    kept = dsir_select(scored, keep_num=1, keep_den=5, bin_width=0.25)
    n = kept.count()
    # 40/200 = exactly the in-domain docs at the 4/5 quantile; the bin
    # boundary can admit a few extra rows, never lose target docs
    assert 40 <= n <= 60
    assert kept.filter(F.col("doc_id") < 40).count() == 40


def test_deterministic(spark, corpus, scored):
    target = corpus.filter(F.col("doc_id") < 40)
    w2 = dsir_weights(corpus, target, buckets=B)
    again = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(corpus, w2, buckets=B).collect()
    }
    first = {r["doc_id"]: r["dsir_score"] for r in scored.collect()}
    assert first == again


def test_validates_inputs(spark, corpus):
    with pytest.raises(ValueError):
        hashed_features(corpus, buckets=1)
    with pytest.raises(ValueError):
        dsir_select(corpus.selectExpr("doc_id", "0.0 as dsir_score"), 0, 5)
