"""BPE (ops/bpe.py): the distributed trainer must reproduce the sequential
reference merge-for-merge (counts included), segmentation replays merges
correctly, and the Sennrich toy example behaves canonically."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.bpe import (
    END_OF_WORD,
    bpe_segment,
    bpe_segment_py,
    bpe_train,
    bpe_train_py,
    word_counts,
)

CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "the the the the newest",
]


@pytest.fixture(scope="module")
def wc(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    return word_counts(docs).persist()


def _wc_py():
    out = {}
    for line in CORPUS:
        for w in line.split():
            out[w] = out.get(w, 0) + 1
    return out


def test_word_counts(spark, wc):
    got = {r["word"]: r["n"] for r in wc.collect()}
    assert got == _wc_py()


def test_train_matches_sequential_reference(spark, wc):
    want = bpe_train_py(_wc_py(), 12)
    got = bpe_train(wc, 12)  # default: local hybrid path (vocab under cap)
    assert got == want


def test_train_distributed_path_matches_sequential(spark, wc):
    # local_max_words=0 forces the distributed per-round path; it must
    # produce the identical merge list (r7 hybrid regression guard)
    want = bpe_train_py(_wc_py(), 12)
    assert bpe_train(wc, 12, local_max_words=0) == want


def test_train_cap_overflow_falls_back_to_distributed(spark, wc):
    # cap smaller than the vocabulary: the bounded collect must NOT
    # truncate training — the distributed path takes over, same result
    want = bpe_train_py(_wc_py(), 6)
    assert bpe_train(wc, 6, local_max_words=2) == want


def test_sennrich_toy_merges(spark, wc):
    # 'newest' x 7 dominates: first merges build "est</w>"
    merges = bpe_train_py(_wc_py(), 4)
    pairs = [(a, b) for a, b, _ in merges[:3]]
    assert ("e", "s") in pairs and ("es", "t") in pairs


def test_segment_matches_python(spark, wc):
    merges = bpe_train(wc, 8)
    docs = spark.createDataFrame(
        [(0, "the lowest newest"), (1, "wide low")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_segment(docs, merges).collect()
    }
    for did, text in [(0, "the lowest newest"), (1, "wide low")]:
        want = [t for w in text.split() for t in bpe_segment_py(w, merges)]
        assert got[did] == want
    # round-trip: concatenating symbols recovers word + marker
    assert "".join(bpe_segment_py("lowest", merges)) == "lowest" + END_OF_WORD


def test_train_validation(spark, wc):
    with pytest.raises(ValueError):
        bpe_train(wc, 0)
