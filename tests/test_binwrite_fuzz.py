"""Seeded fuzz of the binary writers: random small suffix-closed KN-shaped
models must roundtrip BIT-exactly through probing, trie and array-trie, and
within bin radius through the quantized trie (12 random model shapes x 8
random query sentences each)."""

from __future__ import annotations

import random

import numpy as np

WORDS = [f"w{i}" for i in range(12)]


def _random_sections(rng_draw):
    """Random order-3 suffix-closed ArpaSections with plausible (not
    necessarily normalized — the formats don't care) probabilities."""
    from kenlm_rs_spark.lm.arpa import ArpaSections, ProbBackoffNgram, ProbNgram

    n_uni = rng_draw["n_uni"]
    vocab = WORDS[:n_uni]
    uni = ["<unk>", "<s>", "</s>"] + vocab
    bigrams = set()
    for i in rng_draw["bi_idx"]:
        a = (["<s>"] + vocab)[i % (n_uni + 1)]
        b = (vocab + ["</s>"])[(i * 7 + 3) % (n_uni + 1)]
        if b != "<s>" and a != "</s>":
            bigrams.add((a, b))
    bi_list = sorted(bigrams)
    trigrams = set()
    for i in rng_draw["tri_idx"]:
        b2 = bi_list[i % len(bi_list)]
        a = (["<s>"] + vocab)[(i * 5 + 1) % (n_uni + 1)]
        if b2[0] != "<s>" and a != "</s>":
            trigrams.add((a,) + b2)  # suffix bigram present -> closure holds
    # context-activation law: the PREFIX of every trigram must exist as a
    # bigram too (search_hashed.cc:24-55); prefixes only add bigrams whose
    # own closure is unigram-level (always satisfied)
    bigrams |= {g[:2] for g in trigrams}

    def lp(seed):
        return round(-0.1 - (seed % 47) / 13.0, 4)

    sections = ArpaSections(counts=[len(uni), len(bigrams), len(trigrams)])
    sections.backoffs = [
        [
            ProbBackoffNgram(
                -99.0 if w == "<s>" else lp(hash(w) & 0xFFFF),
                (w,),
                -0.0 if (hash(w) % 3 == 0) else lp((hash(w) >> 4) & 0xFFFF) / 2,
            )
            for w in uni
        ],
        [
            ProbBackoffNgram(
                lp(hash(g) & 0xFFFF), g,
                -0.0 if (hash(g) % 2 == 0) else lp((hash(g) >> 3) & 0xFFFF) / 3,
            )
            for g in sorted(bigrams)
        ],
    ]
    sections.no_backoff = [
        ProbNgram(lp(hash(g) & 0xFFFF), g) for g in sorted(trigrams)
    ]
    return sections


def test_roundtrip_random_models(tmp_path):
    from kenlm_rs_spark.lm.binwrite import write_probing, write_trie
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.lm.score import score_texts

    for seed in range(12):
        rng = random.Random(seed)
        rng_draw = {
            "n_uni": rng.randint(3, 12),
            "bi_idx": [rng.randrange(10_000) for _ in range(rng.randint(3, 40))],
            "tri_idx": [rng.randrange(10_000) for _ in range(rng.randint(1, 60))],
        }
        ref = NGramModel.from_arpa(_random_sections(rng_draw))
        texts = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 20)))
            for _ in range(8)
        ]
        expect = score_texts(ref, texts)["log10_prob"]

        p = str(tmp_path / f"{seed}_p.bin")
        write_probing(_random_sections(rng_draw), p)
        t = str(tmp_path / f"{seed}_t.bin")
        write_trie(_random_sections(rng_draw), t)
        a = str(tmp_path / f"{seed}_a.bin")
        write_trie(_random_sections(rng_draw), a, bhiksha_bits=64)
        for path in (p, t, a):
            got = score_texts(NGramModel.load(path), texts)["log10_prob"]
            assert np.array_equal(got, expect), (seed, path)

        q = str(tmp_path / f"{seed}_q.bin")
        write_trie(_random_sections(rng_draw), q, quant_bits=(8, 8))
        gotq = score_texts(NGramModel.load(q), texts)["log10_prob"]
        assert np.all(
            np.abs(gotq.astype(float) - expect.astype(float)) < 3.0
        ), seed
