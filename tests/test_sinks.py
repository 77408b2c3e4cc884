"""Balanced shard writer (sinks/writer.py): shard-count law, content
roundtrip, manifest sidecar, and balance of the hash repartition."""

import json
import os

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.sinks.writer import write_balanced_parquet


@pytest.fixture(scope="module")
def rows(spark):
    return spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )


def test_shard_count_and_roundtrip(spark, rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "out")
    manifest = write_balanced_parquet(rows, path, target_rows_per_file=100)
    assert manifest["rows"] == 1000
    assert manifest["shards"] == 10
    back = spark.read.parquet(path)
    assert back.columns == ["doc_id", "text"]  # _shard_key dropped
    assert back.count() == 1000
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1000))


def test_manifest_sidecar(spark, rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "out")
    write_balanced_parquet(rows, path, target_rows_per_file=300)
    with open(os.path.join(path, "_manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] == 1000 and m["shards"] == 4


def test_shards_are_balanced(spark, rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "out")
    write_balanced_parquet(rows, path, target_rows_per_file=100, key_col="doc_id")
    sizes = [
        r["n"]
        for r in spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 10
    # hash-uniform: every shard within 3x sqrt-band of the mean
    assert max(sizes) < 100 + 3 * 10 and min(sizes) > 100 - 3 * 10


def test_validates_target(spark, rows):
    with pytest.raises(ValueError):
        write_balanced_parquet(rows, "/tmp/nope", target_rows_per_file=0)
