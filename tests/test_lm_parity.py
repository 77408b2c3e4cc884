"""Parity fixtures reproducing the reference test suite.

Golden values from:
- /root/reference/src/model/mod.rs:312-594  (Rust score/state/vocab goldens)
- /root/reference/src/cxx/lm/model_test.cc  (upstream KenLM regression goldens)
- /root/reference/src/headers/mod.rs:8-110  (binary header goldens)
- /root/reference/src/reader/arpa/test.rs   (ARPA record goldens)
- /root/reference/README.md:25-28           (carol.bin example score)
"""

import math

import numpy as np
import pytest

from kenlm_rs_spark.lm.arpa import ArpaError, read_arpa, read_arpa_counts
from kenlm_rs_spark.lm.binary import ModelHasNoVocab
from kenlm_rs_spark.lm.headers import read_headers, total_header_size
from kenlm_rs_spark.lm.model import NGramModel
from kenlm_rs_spark.lm.murmur import hash_for_vocab, murmur_hash64a

REF = "/root/reference"
F32_EPS = 1.2e-7

TEST_SENTENCE = (
    "i have a good deal of will you remember and what i have set my mind "
    "upon no doubt i shall some day achieve"
).split()
TEST_WITH_OOV = TEST_SENTENCE + ["toast"]


@pytest.fixture(scope="module")
def test_bin():
    return NGramModel.load(f"{REF}/test_data/test.bin")


@pytest.fixture(scope="module")
def test_arpa():
    return NGramModel.load(f"{REF}/src/cxx/lm/test.arpa")


@pytest.fixture(scope="module")
def test_nounk():
    return NGramModel.load(f"{REF}/src/cxx/lm/test_nounk.arpa")


# ---------------------------------------------------------------- murmur

def test_murmur_known_vectors():
    # <unk> / <UNK> special hashes must collide across impls only via value
    assert murmur_hash64a(b"", 0) == 0
    # self-consistency of incremental property: hash differs per word
    hs = {hash_for_vocab(w) for w in ["a", "b", "the", "<s>", "</s>", "<unk>"]}
    assert len(hs) == 6


def test_murmur_matches_binary_vocab(test_bin):
    # test.bin stores the hash-ordered vocab hashes; hashing the enumerated
    # words must reproduce them exactly (vocab.cc:22-26 MurmurHash64A seed 0).
    m = test_bin
    for i, w in enumerate(m.words):
        if i == 0:
            continue  # <unk> is not in the hash table
        h = hash_for_vocab(w)
        j = int(np.searchsorted(m.vocab_hashes, np.uint64(h)))
        assert m.vocab_hashes[j] == np.uint64(h)
        assert int(m.vocab_hash_ids[j]) == i


# ---------------------------------------------------------------- headers

def test_header_goldens():
    h = read_headers(f"{REF}/test_data/sanity_fixed_and_counts.bin")
    assert h.fixed.order == 3
    assert h.fixed.probing_multiplier == pytest.approx(1.5)
    assert h.fixed.model_type == 2
    assert h.fixed.has_vocabulary
    assert h.fixed.search_version == 1
    assert h.counts == [24, 24, 24]

    h = read_headers(f"{REF}/test_data/carol.bin")
    assert (h.fixed.order, h.fixed.model_type, h.fixed.search_version) == (3, 2, 1)
    assert h.counts == [4415, 18349, 25612]

    h = read_headers(f"{REF}/test_data/carol_probing_bigram.bin")
    assert (h.fixed.order, h.fixed.model_type, h.fixed.search_version) == (2, 0, 0)
    assert h.counts == [4415, 18349]


def test_total_header_size():
    assert total_header_size(6) == 160
    assert total_header_size(2) == 128


# ---------------------------------------------------------------- ARPA reader

def test_arpa_lm_small_records():
    s = read_arpa(f"{REF}/test_data/arpa/lm_small.arpa")
    assert s.counts == [12, 13, 12]
    unis = s.backoffs[0]
    assert unis[0].ngram == ("<unk>",)
    assert unis[0].log_prob == pytest.approx(-1.3424227)
    assert unis[0].backoff == 0.0 and math.copysign(1, unis[0].backoff) < 0
    assert unis[1].ngram == ("<s>",)
    assert unis[1].backoff == pytest.approx(-0.30103)
    bis = s.backoffs[1]
    assert bis[0].ngram == ("a", "</s>")
    assert bis[0].log_prob == pytest.approx(-0.68063426)
    assert bis[1].ngram == ("<s>", "i")
    tris = s.no_backoff
    assert len(tris) == 12
    assert tris[0].ngram == ("a", "a", "</s>")
    assert tris[0].log_prob == pytest.approx(-0.21873854)


def test_arpa_error_no_data_header():
    with pytest.raises(ArpaError) as e:
        read_arpa(f"{REF}/test_data/arpa/arpa_no_data_header.arpa")
    assert e.value.kind == "DataHeaderMissing"


def test_arpa_error_no_counts():
    with pytest.raises(ArpaError) as e:
        read_arpa(f"{REF}/test_data/arpa/arpa_no_counts.arpa")
    assert e.value.kind in ("NgramCountsMissing", "DataHeaderMissing")


def test_arpa_counts_parser():
    assert read_arpa_counts(iter(["\\data\\", "ngram 1=5", "ngram 2=3", ""])) == [5, 3]


# ---------------------------------------------------------------- vocab goldens

def test_vocab_order_test_bin(test_bin):
    assert test_bin.words == [
        "<unk>", "<s>", "a", "will", "remember", "set", "what", "day", "mind",
        "you", "</s>", "deal", "of", "have", "and", "my", "some", "no", "upon",
        "doubt", "i", "shall", "achieve", "good",
    ]


def test_vocab_order_lm_small():
    m = NGramModel.load(f"{REF}/test_data/arpa/lm_small.arpa")
    assert m.words == [
        "<unk>", "<s>", "</s>", "i", "have", "a", "good", "deal", "of",
        "will", "you", "remember",
    ]


def test_no_vocab_binary_raises():
    with pytest.raises(ModelHasNoVocab):
        NGramModel.load(f"{REF}/test_data/test_no_vocab.bin", store_vocab=True)


def test_no_vocab_binary_scores_via_hashes():
    m = NGramModel.load(f"{REF}/test_data/test_no_vocab.bin", store_vocab=False)
    assert m.words is None
    assert m.score_sentence(["some"], False, False) == pytest.approx(-1.3708712, abs=F32_EPS)


# ---------------------------------------------------------------- score goldens (test.bin)

@pytest.mark.parametrize(
    "sentence,bos,eos,expected",
    [
        (["some"], False, False, -1.3708712),
        (TEST_SENTENCE, False, False, -4.874725),
        (TEST_WITH_OOV, True, True, -7.4208074),
        (TEST_WITH_OOV, False, False, -7.1395426),
        (TEST_WITH_OOV, True, False, -6.0499362),
        (["some"], True, False, -1.6719012),
        (["some"], True, True, -3.3438025),
    ],
)
def test_score_sentence_goldens(test_bin, sentence, bos, eos, expected):
    # widen the f32 golden literal the way the Rust test compares f32 vs f32
    assert test_bin.score_sentence(sentence, bos, eos) == pytest.approx(
        float(np.float32(expected)), abs=F32_EPS * max(1.0, abs(expected))
    )


STATE_TRACE = [
    # (word, word_idx, prefix_length, score) — mod.rs:487-593
    ("some", 16, 1, -1.3708712),
    ("game", 0, 0, -1.9637879),
    ("told", 0, 0, -1.6627579),
    ("me", 0, 0, -1.6627579),
    ("that", 0, 0, -1.6627579),
    ("i", 20, 1, -1.0744861),
    ("have", 13, 2, -0.45023733),
    ("a", 2, 2, -0.41381443),
    ("good", 23, 2, -0.11881906),
    ("deal", 11, 2, -0.11881906),
    ("of", 12, 2, -0.11881906),
    ("will", 3, 2, -0.11881906),
    ("you", 9, 2, -0.11881906),
    ("remember", 4, 2, -0.11881906),
]


def test_states_behave_as_expected(test_bin):
    m = test_bin
    state = m.new_state()
    for word, word_idx, prefix_length, expected in STATE_TRACE:
        assert m.get_word_idx(word) == word_idx
        score, out, _, _ = m.full_score(state, m.get_word_idx(word))
        assert out.length == prefix_length
        assert out.words[0] == word_idx
        assert score == pytest.approx(float(np.float32(expected)), abs=F32_EPS)
        state = out


# ---------------------------------------------------------------- carol goldens

def test_carol_trie_example_score():
    m = NGramModel.load(f"{REF}/test_data/carol.bin")
    s = (
        "the register of his burial was signed by the clergyman the clerk "
        "the undertaker and the chief mourner"
    ).split()
    assert m.score_sentence(s, False, False) == pytest.approx(-23.76212, abs=1e-5)


def test_probing_binary_matches_arpa_build():
    """carol_probing_bigram.bin was built from lm.arpa — our probing loader
    and our from-ARPA builder must agree everywhere."""
    p = NGramModel.load(f"{REF}/test_data/carol_probing_bigram.bin")
    a = NGramModel.load(f"{REF}/test_data/arpa/lm.arpa")
    assert p.counts == a.counts
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(1, 12))
        sent = [a.words[int(i)] for i in rng.integers(1, len(a.words), n)]
        assert p.score_sentence(sent, True, True) == pytest.approx(
            a.score_sentence(sent, True, True), abs=1e-6
        )


# ---------------------------------------------------------------- model_test.cc goldens (test.arpa, 5-gram, pruned)

def append_test(model, state, word, ngram, score, indep):
    tot, out, nglen, il = model.full_score(state, model.get_word_idx(word))
    assert nglen == ngram, f"{word}: ngram_length {nglen} != {ngram}"
    assert tot == pytest.approx(score, rel=1e-5, abs=1e-5), word
    assert il == indep, f"{word}: independent_left {il} != {indep}"
    return out


def test_cxx_starters(test_arpa):
    m = test_arpa
    append_test(m, m.bos_state(), "looking", 2, -0.4846522, True)
    append_test(m, m.bos_state(), ",", 1, -1.383514 + -0.4149733, True)
    append_test(m, m.bos_state(), "this_is_not_found", 1, -1.995635 + -0.4149733, True)


def test_cxx_continuation(test_arpa):
    m = test_arpa
    s = m.bos_state()
    s = append_test(m, s, "looking", 2, -0.484652, True)
    s = append_test(m, s, "on", 3, -0.348837, True)
    s = append_test(m, s, "a", 4, -0.0155266, True)
    s = append_test(m, s, "little", 5, -0.00306122, True)
    preserve = s
    s = append_test(m, s, "the", 1, -4.04005, True)
    s = append_test(m, s, "biarritz", 1, -1.9889, True)
    s = append_test(m, s, "not_found", 1, -2.29666, True)
    s = append_test(m, s, "more", 1, -1.20632 - 20.0, True)
    s = append_test(m, s, ".", 2, -0.51363, True)
    s = append_test(m, s, "</s>", 3, -0.0191651, True)
    assert s.length == 0

    s = preserve
    s = append_test(m, s, "more", 5, -0.00181395, True)
    assert s.length == 4
    s = append_test(m, s, "loin", 5, -0.0432557, True)
    assert s.length == 1


def test_cxx_blanks(test_arpa):
    m = test_arpa
    s = m.null_state()
    s = append_test(m, s, "also", 1, -1.687872, False)
    s = append_test(m, s, "would", 2, -2, True)
    s = append_test(m, s, "consider", 3, -3, True)
    preserve = s
    s = append_test(m, s, "higher", 4, -4, True)
    s = append_test(m, s, "looking", 5, -5, True)
    assert s.length == 1

    s = preserve
    s = append_test(m, s, "not_found", 1, -1.995635 - 7.0 - 0.30103, True)

    s = m.null_state()
    s = append_test(m, s, "higher", 1, -1.509559, False)
    s = append_test(m, s, "looking", 2, -1.285941 - 0.30103, False)
    higher_looking = s
    assert s.length == 1
    s = append_test(m, s, "not_found", 1, -1.995635 - 0.4771212, True)

    s = higher_looking
    s = append_test(m, s, "consider", 1, -1.687872 - 0.4771212, True)

    s = m.null_state()
    s = append_test(m, s, "would", 1, -1.687872, False)
    assert s.length == 1
    s = append_test(m, s, "consider", 2, -1.687872 - 0.30103, False)
    assert s.length == 2
    s = append_test(m, s, "higher", 3, -1.509559 - 0.30103, False)
    assert s.length == 3
    s = append_test(m, s, "looking", 4, -1.285941 - 0.30103, False)


def test_cxx_unknowns(test_arpa):
    m = test_arpa
    s = m.null_state()
    s = append_test(m, s, "not_found", 1, -1.995635, False)
    preserve = s
    s = append_test(m, s, "not_found2", 2, -15.0, True)
    s = append_test(m, s, "not_found3", 2, -15.0 - 2.0, True)

    s = preserve
    s = append_test(m, s, "however", 2, -4, True)
    s = append_test(m, s, "not_found3", 3, -6, True)


def test_cxx_minimal_state(test_nounk):
    m = test_nounk
    s = m.null_state()
    s = append_test(m, s, "baz", 1, -6.535897, True)
    assert s.length == 0
    s = m.null_state()
    s = append_test(m, s, "foo", 1, -3.141592, True)
    assert s.length == 1
    s = append_test(m, s, "bar", 2, -6.0, True)
    assert s.length == 1
    s = append_test(m, s, "bar", 1, -2.718281 + 3.0, True)
    assert s.length == 1

    s = m.null_state()
    s = append_test(m, s, "to", 1, -1.687872, False)
    s = append_test(m, s, "look", 2, -0.2922095, True)
    assert s.length == 2
    s = append_test(m, s, "a", 3, -7, True)


# ---------------------------------------------------------------- perplexity (K14)

def test_perplexity_query_semantics(test_bin):
    m = test_bin
    total, tokens, oov, ppl = m.perplexity(TEST_WITH_OOV, bos=True, eos=True)
    assert tokens == len(TEST_WITH_OOV) + 1
    assert oov == 1
    assert total == pytest.approx(-7.4208074, abs=F32_EPS)
    assert ppl == pytest.approx(math.pow(10.0, 7.4208074 / 26), rel=1e-6)
