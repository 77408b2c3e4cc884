"""Perceptual image hashing (ops/imagehash): independent brute-force twin
via exact Fractions, pigeonhole recall of the banded near-dup join, empty
9th-column dHash blocks, and totality over undecodable payloads."""

from fractions import Fraction

import numpy as np
import pytest


def _brute_ahash(g):
    """Independent aHash: exact Fraction block means vs global mean, block
    membership via explicit interval scan (not the *8//n formula)."""
    h, w = g.shape
    mean = Fraction(int(g.sum()), g.size)
    bits = []
    for iy in range(8):
        ys = [y for y in range(h) if iy * h <= y * 8 < (iy + 1) * h]
        for jx in range(8):
            xs = [x for x in range(w) if jx * w <= x * 8 < (jx + 1) * w]
            vals = [int(g[y, x]) for y in ys for x in xs]
            m = Fraction(sum(vals), len(vals)) if vals else None
            bits.append("1" if (m is not None and m > mean) else "0")
    return "".join(bits)


def _brute_dhash(g):
    h, w = g.shape

    def block(iy, j):
        ys = [y for y in range(h) if iy * h <= y * 8 < (iy + 1) * h]
        xs = [x for x in range(w) if j * w <= x * 9 < (j + 1) * w]
        vals = [int(g[y, x]) for y in ys for x in xs]
        return (sum(vals), len(vals))

    bits = []
    for iy in range(8):
        for j in range(8):
            sl, cl = block(iy, j)
            sr, cr = block(iy, j + 1)
            # mean_l > mean_r via cross-multiplication; empty right block
            # (cr == 0) compares 0 > 0 -> False
            bits.append("1" if sl * cr > sr * cl else "0")
    return "".join(bits)


def test_hash_bits_match_fraction_brute_force():
    from kenlm_rs_spark.ops.imagehash import ahash_bits, dhash_bits

    rng = np.random.RandomState(7)
    for w, h in ((8, 8), (9, 8), (13, 21), (32, 31), (8, 32), (17, 8)):
        g = rng.randint(0, 766, size=(h, w)).astype(np.int64)
        assert ahash_bits(g) == _brute_ahash(g), (w, h)
        assert dhash_bits(g) == _brute_dhash(g), (w, h)


def test_dhash_empty_ninth_column_is_zero_bit():
    """w=8 spreads 8 pixels over 9 column blocks — the 9th is empty; the
    0>0 cross-multiplied compare makes the last bit of each row '0'."""
    from kenlm_rs_spark.ops.imagehash import dhash_bits

    g = np.full((8, 8), 100, dtype=np.int64)
    g[:, 7] = 700  # make the 8th column bright so bit 6 is decisive
    bits = dhash_bits(g)
    rows = [bits[i * 8 : (i + 1) * 8] for i in range(8)]
    for r in rows:
        assert r[7] == "0"  # block 7 vs empty block 8
        assert r[6] == "0"  # 100 < 700: left block NOT greater


def test_gray_scaling_consistent_across_channels():
    """A gray image and its replicated-RGB twin hash identically: 3*c0 for
    1-channel equals r+g+b when r=g=b."""
    from kenlm_rs_spark.ops.imagehash import _gray, ahash_bits

    rng = np.random.RandomState(3)
    mono = rng.randint(0, 256, size=(16, 16, 1)).astype(np.uint8)
    rgb = np.repeat(mono, 3, axis=2)
    assert (_gray(mono) == _gray(rgb)).all()
    assert ahash_bits(_gray(mono)) == ahash_bits(_gray(rgb))


def test_banded_join_finds_all_pairs_within_hamming(spark):
    """Pigeonhole recall: every pair of distinct hashes at hamming <= 3
    (max_hamming < bands=4) appears in the cluster neighbor counts —
    compared against a brute-force all-pairs python hamming."""
    import pandas as pd

    from kenlm_rs_spark.ops.imagehash import hash_dedup_clusters

    rng = np.random.RandomState(11)
    base = rng.randint(0, 2, size=64)
    hashes = []
    for k in range(30):
        v = base.copy()
        flips = rng.choice(64, size=rng.randint(0, 6), replace=False)
        v[flips] ^= 1
        hashes.append("".join(map(str, v)))
    pdf = pd.DataFrame(
        {"doc_id": range(len(hashes) * 2), "ahash": hashes * 2}
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["ahash"]: (r["cluster_size"], r["rep_doc"], r["near_neighbors"])
        for r in hash_dedup_clusters(df, max_hamming=3, bands=4).collect()
    }
    distinct = sorted(set(hashes))
    for hs in distinct:
        want_n = sum(
            1
            for g in distinct
            if g != hs and sum(a != b for a, b in zip(hs, g)) <= 3
        )
        size = hashes.count(hs) * 2
        rep = min(
            i for i, v in enumerate(hashes * 2) if v == hs
        )
        assert got[hs] == (size, rep, want_n), hs


def test_perceptual_hashes_total_over_garbage(spark):
    import pandas as pd

    from kenlm_rs_spark.ops.imagegen import make_png_patterned
    from kenlm_rs_spark.ops.imagehash import perceptual_hashes

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "payload": [
                make_png_patterned(9, 7, 2),
                b"not an image at all",
                None,
            ],
        }
    )
    rows = {
        r["doc_id"]: r
        for r in perceptual_hashes(spark.createDataFrame(pdf)).collect()
    }
    assert rows[0]["format"] == "png" and len(rows[0]["ahash"]) == 64
    assert set(rows[0]["dhash"]) <= {"0", "1"}
    assert rows[1]["ahash"] is None and rows[1]["format"] == "undecodable"
    assert rows[2]["ahash"] is None


def test_perceptual_hashes_total_over_truncated_png_bmp(spark):
    """ADVICE r6: a CUT (not garbage) PNG/BMP raises struct.error /
    zlib.error from the raw decoders — the stage must emit the null-hash
    row, not die."""
    import pandas as pd

    from kenlm_rs_spark.ops.imagegen import make_bmp_patterned, make_png_patterned
    from kenlm_rs_spark.ops.imagehash import perceptual_hashes

    png = make_png_patterned(9, 7, 2)
    bmp = make_bmp_patterned(9, 7)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "payload": [png[: len(png) // 2], bmp[:20], png],
        }
    )
    rows = {
        r["doc_id"]: r
        for r in perceptual_hashes(spark.createDataFrame(pdf)).collect()
    }
    assert rows[0]["ahash"] is None  # truncated PNG -> null row, no crash
    assert rows[1]["ahash"] is None  # truncated BMP header
    assert len(rows[2]["ahash"]) == 64  # intact twin still decodes


def test_bands_must_exceed_max_hamming(spark):
    import pandas as pd

    from kenlm_rs_spark.ops.imagehash import hash_dedup_clusters

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "ahash": ["0" * 64]}))
    with pytest.raises(ValueError, match="pigeonhole"):
        hash_dedup_clusters(df, max_hamming=4, bands=4)
