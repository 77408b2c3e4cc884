"""Training-order shuffle (ops/shuffle.py): totality, per-shard positions
dense from 1, balance, determinism, and seed sensitivity."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.shuffle import training_order


@pytest.fixture(scope="module")
def order(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    return training_order(docs, n_shards=16, seed="e0").cache()


def test_total_and_dense(spark, order):
    assert order.count() == 2000
    per = order.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    ).collect()
    assert len(per) == 16
    for r in per:
        assert r["lo"] == 1 and r["hi"] == r["n"]  # dense 1..n per shard


def test_balanced(spark, order):
    sizes = [r["n"] for r in order.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert max(sizes) < 125 + 4 * 12 and min(sizes) > 125 - 4 * 12


def test_deterministic_and_seed_sensitive(spark, order):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    again = training_order(docs, n_shards=16, seed="e0")
    assert sorted(map(tuple, order.collect())) == sorted(map(tuple, again.collect()))
    other = training_order(docs, n_shards=16, seed="e1")
    a = {(r["doc_id"]): (r["shard"], r["pos"]) for r in order.collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in other.collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 1900  # md5 avalanche: almost every doc moves


def test_validates_shards(spark):
    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        training_order(docs, n_shards=0)
