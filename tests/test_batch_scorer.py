"""The vectorized batch scorer must be bit-exact with the sequential state
machine (which itself reproduces the reference goldens)."""

import numpy as np
import pytest

from kenlm_rs_spark.lm.model import NGramModel
from kenlm_rs_spark.lm.score import (
    score_batch,
    score_documents,
    score_texts,
    split_texts,
    tokens_to_ids,
)

REF = "/root/reference"

TEST_SENTENCE = (
    "i have a good deal of will you remember and what i have set my mind "
    "upon no doubt i shall some day achieve"
).split()
TEST_WITH_OOV = TEST_SENTENCE + ["toast"]


@pytest.fixture(scope="module", params=["test.bin", "test.arpa", "carol.bin"])
def model(request):
    paths = {
        "test.bin": f"{REF}/test_data/test.bin",
        "test.arpa": f"{REF}/src/cxx/lm/test.arpa",
        "carol.bin": f"{REF}/test_data/carol.bin",
    }
    return NGramModel.load(paths[request.param])


@pytest.mark.parametrize("bos,eos", [(True, True), (False, False), (True, False), (False, True)])
def test_batch_matches_scalar_exactly(model, bos, eos):
    rng = np.random.default_rng(11)
    docs = [TEST_SENTENCE, TEST_WITH_OOV, ["some"], [], ["zzz_oov", "yyy_oov"]]
    for _ in range(40):
        n = int(rng.integers(0, 14))
        docs.append([model.words[int(i)] for i in rng.integers(1, len(model.words), n)])
    res = score_documents(model, docs, bos=bos, eos=eos)
    for d, got, tok, oov in zip(docs, res["log10_prob"], res["tokens"], res["oov"]):
        want = model.score_sentence(d, bos, eos)
        assert float(got) == want, d
        assert tok == len(d) + (1 if eos else 0)
        want_oov = sum(1 for w in d if model.get_word_idx(w) == 0)
        assert oov == want_oov


def test_batch_ext_len_matches_state_trace():
    m = NGramModel.load(f"{REF}/test_data/test.bin")
    words = ["some", "game", "told", "me", "that", "i", "have", "a", "good"]
    expected_len = [1, 0, 0, 0, 0, 1, 2, 2, 2]
    res = score_documents(m, [words], bos=False, eos=False)
    assert list(res["ext_len"]) == expected_len


def test_split_texts_delimiters():
    flat, offs = split_texts(["a\tb\nc\rd e", "", "x\x00y"])
    assert list(flat) == ["a", "b", "c", "d", "e", "x", "y"]
    assert list(offs) == [0, 5, 5, 7]


def test_score_texts_end_to_end():
    m = NGramModel.load(f"{REF}/test_data/test.bin")
    res = score_texts(m, [" ".join(TEST_SENTENCE)], bos=False, eos=False)
    assert float(res["log10_prob"][0]) == pytest.approx(
        float(np.float32(-4.874725)), abs=1.2e-7
    )


def test_tokens_to_ids_oov():
    m = NGramModel.load(f"{REF}/test_data/test.bin")
    ids = tokens_to_ids(m, np.array(["some", "nope", "i"], dtype=object))
    assert list(ids) == [16, 0, 20]


def test_empty_batch():
    m = NGramModel.load(f"{REF}/test_data/test.bin")
    res = score_batch(m, np.zeros(0, dtype=np.int64), np.array([0]), True, True)
    assert len(res["log10_prob"]) == 0
