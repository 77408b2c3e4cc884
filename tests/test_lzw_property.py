"""Property-based cross-check of the GIF LZW codec pair: the forward
compressor (ops/imagegen.lzw_encode_gif) and the independent reverse
decompressor (ops/multimodal._lzw_decode_gif) must roundtrip ANY byte
sequence at any legal min code size — including adversarial shapes
Hypothesis finds (long runs that trigger the KwKwK chain, alphabet sizes
right at the code-width boundaries, streams long enough to grow the
table). Pure Python, no Spark session."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kenlm_rs_spark.ops.imagegen import lzw_encode_gif
from kenlm_rs_spark.ops.multimodal import _lzw_decode_gif


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=4000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_any_bytes(data, mcs):
    # clamp symbols into the palette range for the chosen code size
    alphabet = 1 << mcs
    data = bytes(b % alphabet for b in data)
    enc = lzw_encode_gif(data, mcs)
    assert _lzw_decode_gif(enc, mcs, len(data)) == data


@settings(max_examples=50, deadline=None)
@given(
    run_byte=st.integers(min_value=0, max_value=255),
    n=st.integers(min_value=1, max_value=9000),
)
def test_lzw_roundtrip_runs(run_byte, n):
    # maximal-compression runs walk the KwKwK special case repeatedly
    data = bytes([run_byte]) * n
    enc = lzw_encode_gif(data, 8)
    assert _lzw_decode_gif(enc, 8, len(data)) == data
    assert len(enc) < n + 16  # runs must actually compress


def test_lzw_truncation_always_raises():
    import pytest

    data = bytes(range(256)) * 4
    enc = lzw_encode_gif(data, 8)
    with pytest.raises(ValueError):
        _lzw_decode_gif(enc, 8, len(data) + 1)
    with pytest.raises(ValueError):
        _lzw_decode_gif(enc[: len(enc) // 2], 8, len(data))
