"""Bloom filter (ops/bloom.py): no false negatives ever, expression path ==
Arrow path bit-for-bit, observable false-positive rate in the expected band,
and signed-word packing round-trips bit 63."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.bloom import (
    bitmap_words,
    bloom_build,
    bloom_might_contain,
    bloom_might_contain_udf,
)

M, K = 4096, 5


@pytest.fixture(scope="module")
def keyed(spark):
    df = spark.createDataFrame(
        [(i, f"url-{i}") for i in range(400)], "doc_id long, key string"
    )
    seen = df.filter(F.col("doc_id") % 4 == 0).select("key")
    positions = [r["pos"] for r in bloom_build(seen, "key", M, k=K).collect()]
    return df, positions


def test_no_false_negatives(spark, keyed):
    df, positions = keyed
    got = bloom_might_contain(df, positions, "key", M, k=K).collect()
    for r in got:
        if r["doc_id"] % 4 == 0:
            assert r["bloom_maybe"], r


def test_false_positive_rate_in_band(spark, keyed):
    df, positions = keyed
    got = bloom_might_contain(df, positions, "key", M, k=K).collect()
    fp = sum(1 for r in got if r["bloom_maybe"] and r["doc_id"] % 4 != 0)
    n_non = sum(1 for r in got if r["doc_id"] % 4 != 0)
    # theoretical fp ~ (1 - e^(-k*n/m))^k with n=100, m=4096, k=5 -> ~0.2%
    assert fp / n_non < 0.05


def test_expression_and_udf_paths_agree(spark, keyed):
    df, positions = keyed
    expr = {
        r["doc_id"]: r["bloom_maybe"]
        for r in bloom_might_contain(df, positions, "key", M, k=K).collect()
    }
    bitmap = np.array(bitmap_words(positions, M), dtype=np.int64).view(
        np.uint64
    )
    arrow = {
        r["doc_id"]: r["bloom_maybe"]
        for r in bloom_might_contain_udf(
            df, bitmap, "key", M, k=K
        ).collect()
    }
    assert expr == arrow


def test_lazy_bitmap_column_path_agrees(spark, keyed):
    """r7: the in-plan bitmap frame + column probe must be value-identical
    to the literal expression path (same words, same bit tests), and the
    assembled words array must equal bitmap_words exactly."""
    from kenlm_rs_spark.ops.bloom import bloom_bitmap_df, bloom_might_contain_col

    df, positions = keyed
    seen = df.filter(F.col("doc_id") % 4 == 0).select("key")
    words_df = bloom_bitmap_df(seen, "key", M, k=K)
    assert list(words_df.collect()[0]["words"]) == bitmap_words(positions, M)
    expr = {
        r["doc_id"]: r["bloom_maybe"]
        for r in bloom_might_contain(df, positions, "key", M, k=K).collect()
    }
    col = {
        r["doc_id"]: r["bloom_maybe"]
        for r in bloom_might_contain_col(df, words_df, "key", M, k=K).collect()
    }
    assert expr == col


def test_bitmap_words_bit63_sign():
    words = bitmap_words([63], 64)
    assert len(words) == 1
    assert words[0] == -(1 << 63)  # bit 63 set -> signed min, valid long
    words = bitmap_words([0, 64, 127], 128)
    assert words[0] == 1 and words[1] == 1 - (1 << 63)


def test_build_validation(spark, keyed):
    df, _ = keyed
    with pytest.raises(ValueError):
        bloom_build(df, "key", m_bits=8)
