"""Character entropy (ops/entropy.py): hand-computed values, edge cases
(empty / single-char / signed zero), unicode codepoints, and spam-vs-text
ordering."""

import math

import pytest

from kenlm_rs_spark.ops.entropy import _entropy_one, char_entropy


def test_hand_values():
    # "aabb": p = [1/2, 1/2] -> H = 1 bit
    assert _entropy_one("aabb") == (4, 2, 1.0)
    # uniform over 4 chars -> 2 bits
    assert _entropy_one("abcd")[2] == 2.0
    # "aaab": -(3/4 log2 3/4 + 1/4 log2 1/4)
    expect = round(-(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25)), 6)
    assert abs(_entropy_one("aaab")[2] - expect) < 2e-6


def test_edges_and_signed_zero():
    assert _entropy_one("") == (0, 0, 0.0)
    n, d, h = _entropy_one("aaaa")
    assert (n, d, h) == (4, 1, 0.0)
    assert math.copysign(1.0, h) == 1.0  # +0.0, not -0.0


def test_unicode_codepoints():
    n, d, _ = _entropy_one("é☃é")
    assert n == 3 and d == 2  # codepoints, not bytes


def test_spam_scores_lower_than_text(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["char_entropy"] for r in char_entropy(docs).collect()}
    assert out[1] < 0.1 < out[0]
