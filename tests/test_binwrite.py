"""Binary writers (S7) + quantized/bhiksha readers (K21/K22).

Roundtrip law: ARPA -> written binary -> loaded model must score
BIT-IDENTICALLY to the from_arpa model for lossless formats (probing, trie,
array-trie), and within the quantization bin radius for quant variants.
Headers must satisfy the byte law read_headers validates against real files.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

ARPAS = {
    "lm_small": "/root/reference/test_data/arpa/lm_small.arpa",
    "en": os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "lms", "en.arpa",
    ),
}

SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "a b c d e",
    "data table hash merge group order by key",
    "",
    "completely unseen OOV tokens zzz qqq",
]


def _sections(path):
    from kenlm_rs_spark.lm.arpa import read_arpa

    return read_arpa(path)


def _score_all(model, bos=True, eos=True):
    from kenlm_rs_spark.lm.score import score_texts

    return score_texts(model, SENTENCES, bos=bos, eos=eos)["log10_prob"]


@pytest.fixture(scope="module", params=list(ARPAS))
def arpa_path(request):
    p = ARPAS[request.param]
    if not os.path.exists(p):
        pytest.skip(f"{p} missing")
    return p


@pytest.fixture(scope="module")
def ref_model(arpa_path):
    from kenlm_rs_spark.lm.model import NGramModel

    return NGramModel.from_arpa(_sections(arpa_path))


def _roundtrip(arpa_path, tmp_path, writer, name, **kw):
    from kenlm_rs_spark.lm.model import NGramModel

    out = str(tmp_path / name)
    writer(_sections(arpa_path), out, **kw)
    return out, NGramModel.load(out)


def test_probing_roundtrip_bit_exact(arpa_path, ref_model, tmp_path):
    from kenlm_rs_spark.lm.binwrite import write_probing
    from kenlm_rs_spark.lm.headers import PROBING, read_headers, total_header_size

    out, m = _roundtrip(arpa_path, tmp_path, write_probing, "probing.bin")
    h = read_headers(out)
    assert h.fixed.model_type == PROBING and h.fixed.search_version == 0
    assert h.header_size == total_header_size(h.fixed.order)
    assert h.counts == list(ref_model.counts)
    assert np.array_equal(_score_all(m), _score_all(ref_model))


def test_trie_roundtrip_bit_exact(arpa_path, ref_model, tmp_path):
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.headers import TRIE, read_headers

    out, m = _roundtrip(arpa_path, tmp_path, write_trie, "trie.bin")
    h = read_headers(out)
    assert h.fixed.model_type == TRIE and h.fixed.search_version == 1
    assert np.array_equal(_score_all(m), _score_all(ref_model))


def test_array_trie_roundtrip_bit_exact(arpa_path, ref_model, tmp_path):
    """K22: bhiksha pointer compression is LOSSLESS — scores bit-identical,
    file no larger than the plain trie."""
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.headers import ARRAY_TRIE, read_headers

    plain, _ = _roundtrip(arpa_path, tmp_path, write_trie, "trie_plain.bin")
    out, m = _roundtrip(
        arpa_path, tmp_path, write_trie, "array_trie.bin", bhiksha_bits=64
    )
    h = read_headers(out)
    assert h.fixed.model_type == ARRAY_TRIE
    assert np.array_equal(_score_all(m), _score_all(ref_model))
    assert os.path.getsize(out) <= os.path.getsize(plain) + 64


def test_quant_trie_roundtrip_within_bin_error(arpa_path, ref_model, tmp_path):
    """K21: quantized probs/backoffs decode to bin centers; per-token scores
    differ from exact by at most the worst bin radius per charged value."""
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.headers import QUANT_TRIE, read_headers

    out, m = _roundtrip(
        arpa_path, tmp_path, write_trie, "quant.bin", quant_bits=(8, 8)
    )
    h = read_headers(out)
    assert h.fixed.model_type == QUANT_TRIE
    exact = _score_all(ref_model).astype(np.float64)
    quant = _score_all(m).astype(np.float64)
    # loose but real bound: every charge (<= 2*order per token) moved at most
    # the worst bin radius; with 8 bits on these tables that is well under 0.5
    assert np.all(np.abs(exact - quant) < 2.0), (exact, quant)
    # lossiness only shows when an order has more distinct values than bins
    distinct = len({np.float32(r.log_prob) for r in _sections(arpa_path).no_backoff})
    if distinct > (1 << 8):
        assert np.abs(exact - quant).max() > 0


def test_quant_array_trie_combination(arpa_path, ref_model, tmp_path):
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.headers import QUANT_ARRAY_TRIE, read_headers
    from kenlm_rs_spark.lm.model import NGramModel

    out, m = _roundtrip(
        arpa_path, tmp_path, write_trie, "qat.bin",
        quant_bits=(8, 8), bhiksha_bits=64,
    )
    h = read_headers(out)
    assert h.fixed.model_type == QUANT_ARRAY_TRIE
    # bhiksha is lossless on top of quantization: equals the quant-only file
    out_q, mq = _roundtrip(
        arpa_path, tmp_path, write_trie, "q_only.bin", quant_bits=(8, 8)
    )
    assert np.array_equal(_score_all(m), _score_all(mq))


def test_quant_backoff_reserved_slots(arpa_path, tmp_path):
    """Zero backoffs keep their extension flag through quantization: slot 0
    decodes to -0.0 (no extension), slot 1 to +0.0 (extension)."""
    from kenlm_rs_spark.lm.binwrite import write_trie
    from kenlm_rs_spark.lm.model import NGramModel

    out = str(tmp_path / "quant2.bin")
    write_trie(_sections(arpa_path), out, quant_bits=(8, 8))
    m = NGramModel.load(out)
    for tab in m.middles:
        zeros = tab.backoff[tab.backoff == 0.0]
        if len(zeros):
            bits = zeros.view(np.uint32)
            assert set(bits.tolist()) <= {0, 0x80000000}


def test_writer_rejects_sri_holes(tmp_path):
    from kenlm_rs_spark.lm.binwrite import write_probing, write_trie

    p = "/root/reference/src/cxx/lm/test.arpa"
    if not os.path.exists(p):
        pytest.skip("test.arpa missing")
    with pytest.raises(ValueError, match="suffix hole"):
        write_trie(_sections(p), str(tmp_path / "x.bin"))
    with pytest.raises(ValueError, match="suffix hole"):
        write_probing(_sections(p), str(tmp_path / "y.bin"))


def test_committed_fixture_binaries_stay_loadable():
    """Byte-stability regression: the committed fixture binaries (written by
    the version of the writer that froze them) must keep loading and scoring
    identically across reader changes."""
    from kenlm_rs_spark.lm.model import NGramModel

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "bins",
    )
    for name in ("lm_small_probing.bin", "lm_small_trie.bin", "lm_small_qat.bin"):
        m = NGramModel.load(os.path.join(base, name))
        assert m.counts == [12, 13, 12]
        got = m.score_sentence(["a", "b"], True, True)
        assert got == pytest.approx(-3.81425, abs=5e-5), (name, got)


def test_committed_order4_bhiksha_fixture_stays_loadable():
    """Byte-stability for the r3 ALIGNED bhiksha layout at order 4 (the
    second middle's region base is misaligned in this file, so a reader that
    loses the AlignTo8 law fails here immediately)."""
    import hashlib

    from kenlm_rs_spark.lm.model import NGramModel

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "bins", "order4_bhiksha.bin",
    )
    blob = open(path, "rb").read()
    assert hashlib.sha256(blob).hexdigest().startswith("e4cb35782535e2a2")
    m = NGramModel.load(path)
    assert m.counts == [14, 144, 533, 438]
    got = m.score_sentence(["w1", "w2", "w3"], True, True)
    assert got == pytest.approx(-9.7192001, abs=5e-5), got


def test_written_probing_matches_reference_probing_layout(tmp_path):
    """The written probing file must be structurally interchangeable with a
    reference-produced probing file: same header law, same bucket-count law,
    vocab ids resolvable, and reloading twice is byte-stable."""
    from kenlm_rs_spark.lm.binwrite import write_probing

    p = ARPAS["lm_small"]
    out1, out2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    write_probing(_sections(p), out1)
    write_probing(_sections(p), out2)
    assert open(out1, "rb").read() == open(out2, "rb").read()  # deterministic
