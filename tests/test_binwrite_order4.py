"""Order >= 4 bhiksha (ARRAY_TRIE) layout + roundtrip regression.

kenlm's ArrayBhiksha (reference bhiksha.cc) writes the {version, config_bits}
bytes at the RAW region base (FinishedLoading -> original_base_) but places
the offsets array at AlignTo8(base) + 8; the region size 8*(1+count)+7 leaves
slack that absorbs the alignment skid. For order 3 there is a single middle
whose region base happens to be 8-aligned, so an unaligned-layout writer
passes; the FIRST file that exposes the law is order >= 4, where the second
middle's base is generally misaligned (ADVICE r2: offset % 8 == 2 observed).

These tests (a) roundtrip order-4/5 bhiksha models bit-exactly, (b) assert
the external layout law directly on the written bytes — offsets array at an
8-aligned ABSOLUTE file offset, version/config at the raw region base — and
(c) assert the suite genuinely covers a misaligned region base.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

WORDS = [f"w{i}" for i in range(14)]


def _random_sections_n(order: int, seed: int, fan: int = 60):
    """Random suffix- AND prefix-closed ArpaSections of a given order."""
    from kenlm_rs_spark.lm.arpa import ArpaSections, ProbBackoffNgram, ProbNgram

    rng = random.Random(seed)
    n_uni = rng.randint(5, len(WORDS))
    vocab = WORDS[:n_uni]
    uni = ["<unk>", "<s>", "</s>"] + vocab
    grams: dict[int, set] = {1: {(w,) for w in uni}}
    cur = set()
    for _ in range(rng.randint(8, fan)):
        cur.add((rng.choice(["<s>"] + vocab), rng.choice(vocab + ["</s>"])))
    grams[2] = cur
    for n in range(3, order + 1):
        prev = sorted(g for g in grams[n - 1] if "<s>" not in g)
        cur = set()
        for _ in range(rng.randint(6, fan)):
            base = rng.choice(prev)
            a = rng.choice(["<s>"] + vocab)
            cur.add((a,) + base)
        grams[n] = cur
    # closure fix-point, top-down: prefix AND suffix of every n-gram must
    # exist at n-1 (trie layout wants suffixes; context activation wants
    # prefixes); at n=3 the additions land at order 2 whose own closure is
    # unigram-level and always satisfied
    for n in range(order, 2, -1):
        for g in list(grams[n]):
            grams[n - 1].add(g[1:])
            grams[n - 1].add(g[:-1])

    def lp(seedv):
        return round(-0.1 - (seedv % 47) / 13.0, 4)

    sections = ArpaSections(counts=[len(grams[n]) for n in range(1, order + 1)])
    sections.backoffs = []
    for n in range(1, order):
        level = uni if n == 1 else sorted(grams[n])
        sections.backoffs.append(
            [
                ProbBackoffNgram(
                    -99.0 if g == ("<s>",) or g == "<s>" else lp(hash(g) & 0xFFFF),
                    (g,) if n == 1 else g,
                    -0.0 if (hash(g) % 3 == 0) else lp((hash(g) >> 4) & 0xFFFF) / 2,
                )
                for g in level
            ]
        )
    sections.no_backoff = [
        ProbNgram(lp(hash(g) & 0xFFFF), g) for g in sorted(grams[order])
    ]
    return sections


def _walk_bhiksha_regions(path):
    """Independently walk the written trie file and yield, per middle,
    (region_base, offsets_abs_offset, array_count) using only header facts +
    the layout laws (NOT the model loader, to keep the check external)."""
    from kenlm_rs_spark.lm.binary import _chop_bits_read, required_bits
    from kenlm_rs_spark.lm.headers import read_headers

    h = read_headers(path)
    counts = h.counts
    order = len(counts)
    data = open(path, "rb").read()
    pos = h.header_size + 8 + 8 * counts[0]  # vocab region
    quantized = h.fixed.model_type in (5, 6)  # QUANT_TRIE / QUANT_ARRAY_TRIE
    pb = bb = 0
    if quantized:
        pb, bb = data[pos + 1], data[pos + 2]
        pos += 8 + sum(4 * ((1 << pb) + (1 << bb)) for _ in range(2, order)) + 4 * (1 << pb)
    pos += (counts[0] + 2) * 16  # unigram array
    word_bits = required_bits(counts[0])
    out = []
    for n in range(2, order):
        entries = counts[n - 1]
        base = pos
        config_bits = data[pos + 1]
        assert data[pos] == 0, "version byte must sit at the RAW region base"
        chop = _chop_bits_read(entries + 1, counts[n], config_bits)
        next_bits = required_bits(counts[n]) - chop
        array_count = (counts[n] >> next_bits) + 1
        off_abs = pos + (-pos) % 8 + 8
        out.append((base, off_abs, array_count, chop))
        pos += 8 * (1 + array_count) + 7
        quant_width = (pb + bb) if quantized else 63
        total_bits = word_bits + quant_width + next_bits
        pos += ((1 + entries) * total_bits + 7) // 8 + 8
    return out


SENTS = [
    " ".join(random.Random(s).choice(WORDS) for _ in range(random.Random(s).randint(0, 18)))
    for s in range(10)
]


@pytest.mark.parametrize("order", [4, 5])
def test_order_ge4_bhiksha_roundtrip_bit_exact(order, tmp_path):
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.lm.score import score_texts

    saw_misaligned_base = False
    for seed in range(6):
        sections = _random_sections_n(order, seed)
        ref = NGramModel.from_arpa(_random_sections_n(order, seed))
        expect = score_texts(ref, SENTS)["log10_prob"]

        a = str(tmp_path / f"{order}_{seed}_a.bin")
        write_trie(sections, a, bhiksha_bits=64)
        got = score_texts(NGramModel.load(a), SENTS)["log10_prob"]
        assert np.array_equal(got, expect), (order, seed)

        for base, off_abs, array_count, _ in _walk_bhiksha_regions(a):
            assert off_abs % 8 == 0, (order, seed, base, off_abs)
            if base % 8 != 0:
                saw_misaligned_base = True

        q = str(tmp_path / f"{order}_{seed}_q.bin")
        write_trie(sections, q, quant_bits=(8, 8), bhiksha_bits=64)
        qm = NGramModel.load(q)
        gotq = score_texts(qm, SENTS)["log10_prob"]
        assert np.all(np.abs(gotq.astype(float) - expect.astype(float)) < 3.0)
        for base, off_abs, array_count, _ in _walk_bhiksha_regions(q):
            assert off_abs % 8 == 0, (order, seed, "quant", base, off_abs)
            if base % 8 != 0:
                saw_misaligned_base = True
    # the suite must actually exercise the alignment skid, else it proves
    # nothing beyond the order-3 aligned case
    assert saw_misaligned_base, f"no misaligned bhiksha base seen at order {order}"


def test_bhiksha_chop_gt_zero_layout(tmp_path):
    """A model big enough that ChopBits picks chop > 0 (a real offsets
    table, not the degenerate single-zero array) still roundtrips and obeys
    the alignment law."""
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.lm.score import score_texts

    sections = _random_sections_n(4, 99, fan=600)
    ref = NGramModel.from_arpa(_random_sections_n(4, 99, fan=600))
    a = str(tmp_path / "big_a.bin")
    write_trie(sections, a, bhiksha_bits=64)
    regions = _walk_bhiksha_regions(a)
    assert any(chop > 0 for _, _, _, chop in regions), regions
    for _, off_abs, _, _ in regions:
        assert off_abs % 8 == 0
    expect = score_texts(ref, SENTS)["log10_prob"]
    got = score_texts(NGramModel.load(a), SENTS)["log10_prob"]
    assert np.array_equal(got, expect)
