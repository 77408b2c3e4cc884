"""Real pixel decode (ops/multimodal.decode_pixels): encoder/decoder
roundtrips over independent forward/reverse filter implementations, layout
quirks (BMP BGR bottom-up padding), declared codec boundaries, and the
image_pixel_stats Spark operator."""

import numpy as np
import pytest


def test_png_roundtrip_all_color_types_and_filters():
    """decode(make_png_patterned(...)) == the arithmetic pattern, for every
    supported color type; the encoder cycles filter y%5 so all five PNG
    scanline filters (None/Sub/Up/Average/Paeth) are exercised."""
    from kenlm_rs_spark.ops.imagegen import (
        PNG_CHANNELS,
        make_png_patterned,
        pattern_pixels,
    )
    from kenlm_rs_spark.ops.multimodal import decode_pixels

    for ct in (0, 2, 4, 6):
        for w, h in ((1, 1), (2, 2), (13, 9), (8, 32), (32, 31)):
            got = decode_pixels(make_png_patterned(w, h, ct))
            want = pattern_pixels(w, h, PNG_CHANNELS[ct])
            assert got.shape == want.shape, (ct, w, h)
            assert (got == want).all(), (ct, w, h)


def test_bmp_roundtrip_bgr_bottom_up_padding():
    from kenlm_rs_spark.ops.imagegen import make_bmp_patterned, pattern_pixels
    from kenlm_rs_spark.ops.multimodal import decode_pixels

    # widths chosen so the row stride padding is 0..3 bytes
    for w, h in ((1, 1), (2, 2), (3, 5), (4, 4), (13, 9), (32, 31)):
        got = decode_pixels(make_bmp_patterned(w, h))
        assert (got == pattern_pixels(w, h, 3)).all(), (w, h)


def test_decode_hand_golden_sub_filter():
    """Hand-built 2x1 grayscale PNG with a Sub-filtered row: raw scanline
    [filter=1, 10, 7] must reconstruct to [10, 17] — pins the unfilter
    direction independently of the encoder."""
    import struct
    import zlib

    from kenlm_rs_spark.ops.imagegen import png_chunk
    from kenlm_rs_spark.ops.multimodal import decode_pixels

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    raw = bytes([1, 10, 7])  # Sub: recon = [10, (7+10)%256=17]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"IDAT", zlib.compress(raw))
        + png_chunk(b"IEND", b"")
    )
    got = decode_pixels(png)
    assert got.shape == (1, 2, 1)
    assert got.reshape(-1).tolist() == [10, 17]


def test_codec_boundaries_raise():
    """WEBP is the remaining declared NotImplementedError boundary (true
    entropy codec); header metadata still parses. Baseline JPEG decodes
    for REAL now (r6), so the legacy header-only JPEG stream (make_jpeg,
    no SOS) fails honestly as a corrupt container (ValueError), like the
    legacy 1-pixel-stream GIF — stats rows stay 'undecodable'."""
    from kenlm_rs_spark.ops.imagegen import make_gif, make_jpeg, make_webp_vp8l
    from kenlm_rs_spark.ops.multimodal import decode_pixels, parse_image_header

    assert parse_image_header(make_webp_vp8l(4, 3)) is not None
    with pytest.raises(NotImplementedError):
        decode_pixels(make_webp_vp8l(4, 3))
    assert parse_image_header(make_jpeg(4, 3)) is not None
    with pytest.raises(ValueError, match="SOS"):
        decode_pixels(make_jpeg(4, 3))
    assert parse_image_header(make_gif(4, 3)) is not None
    with pytest.raises(ValueError, match="truncated"):
        decode_pixels(make_gif(4, 3))


def test_gif_lzw_roundtrip():
    """Forward LZW compressor (imagegen) against the independent reverse
    decompressor (multimodal): patterned, random (width growth through 12
    bits + 4096 table reset), runs (KwKwK case), tiny, and mcs=2."""
    import random

    from kenlm_rs_spark.ops.imagegen import lzw_encode_gif
    from kenlm_rs_spark.ops.multimodal import _lzw_decode_gif

    rng = random.Random(0)
    cases = [
        bytes(range(256)) * 40,
        bytes(rng.randrange(256) for _ in range(20000)),  # forces reset
        b"\x00" * 5000,        # KwKwK-heavy run
        b"abcabcabc" * 700,
        bytes([5]),
    ]
    for data in cases:
        assert _lzw_decode_gif(lzw_encode_gif(data, 8), 8, len(data)) == data
    d2 = bytes(rng.randrange(4) for _ in range(3000))
    assert _lzw_decode_gif(lzw_encode_gif(d2, 2), 2, len(d2)) == d2


def test_gif_lzw_hand_golden():
    """The legacy trivial stream (written independently in r4's make_gif:
    0x02 0x44 0x01 = Clear, literal 0, EOI at mcs=2) decodes to exactly
    one index — a hand-checkable vector for the bit unpacking."""
    from kenlm_rs_spark.ops.multimodal import _lzw_decode_gif

    assert _lzw_decode_gif(b"\x44\x01", 2, 1) == b"\x00"
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode_gif(b"\x44\x01", 2, 2)


def test_gif_roundtrip_patterned():
    """decode(make_gif_patterned(w,h)) == palette-mapped pattern."""
    from kenlm_rs_spark.ops.imagegen import (
        GIF_PALETTE_MULS,
        make_gif_patterned,
        pattern_pixels,
    )
    from kenlm_rs_spark.ops.multimodal import decode_pixels

    for w, h in ((1, 1), (8, 8), (33, 21), (40, 13)):
        got = decode_pixels(make_gif_patterned(w, h))
        assert got.shape == (h, w, 3)
        idx = pattern_pixels(w, h, 1)[:, :, 0].astype(np.int64)
        for c, m in enumerate(GIF_PALETTE_MULS):
            assert (got[:, :, c].astype(np.int64) == (idx * m) % 256).all()


def test_gif_interlaced_declared():
    from kenlm_rs_spark.ops.imagegen import make_gif_patterned
    from kenlm_rs_spark.ops.multimodal import decode_pixels

    payload = bytearray(make_gif_patterned(8, 8))
    # image descriptor flags byte: 6 (header) + 7 (LSD) + 768 (palette)
    # + 1 (',') + 8 (left/top/w/h) = offset 790
    assert payload[781] == ord(",")
    payload[790] |= 0x40  # set interlace bit
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_pixels(bytes(payload))


def test_fixture_images_decode():
    """The committed zero-pixel fixtures decode to all-zero arrays of the
    advertised shapes."""
    from kenlm_rs_spark.ops.multimodal import decode_pixels

    px = decode_pixels(open("fixtures/images/tiny_rgb.png", "rb").read())
    assert px.ndim == 3 and px.shape[2] == 3 and (px == 0).all()
    px = decode_pixels(open("fixtures/images/tiny.bmp", "rb").read())
    assert px.ndim == 3 and px.shape[2] == 3 and (px == 0).all()


def test_image_pixel_stats_spark(spark):
    """image_pixel_stats over a mixed batch: analytic means for patterned
    images, nulls + 'undecodable' for garbage, jpeg header-only rows."""
    from pyspark.sql import functions as F

    from kenlm_rs_spark.ops.imagegen import (
        make_bmp_patterned,
        make_jpeg,
        make_png_patterned,
        pattern_pixels,
    )
    from kenlm_rs_spark.ops.multimodal import image_pixel_stats

    rows = [
        (0, bytearray(make_png_patterned(5, 4, 2))),
        (1, bytearray(make_bmp_patterned(6, 3))),
        (2, bytearray(b"not an image at all")),
        (3, bytearray(make_jpeg(7, 2))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_pixel_stats(df).collect()}
    px = pattern_pixels(5, 4, 3)
    want_mean0 = float(px[..., 0].sum()) / (5 * 4)
    assert got[0]["format"] == "png" and got[0]["channels"] == 3
    assert abs(got[0]["mean_c0"] - want_mean0) < 1e-12
    assert got[0]["mean_c3"] is None
    assert got[1]["format"] == "bmp" and (got[1]["width"], got[1]["height"]) == (6, 3)
    assert got[2]["format"] == "undecodable" and got[2]["width"] is None
    # jpeg: header parses (format known) but pixels undecodable -> nulls
    assert got[3]["format"] == "jpeg" and got[3]["mean_c0"] is None
    # plan shape: one Arrow stage, no shuffle
    plan = (
        image_pixel_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_image_pooled_features_spark(spark):
    """decode -> grayscale -> 4x4 average pool: cell (r,c) mean equals the
    integer-sum/count rational over pixels with (4y//h, 4x//w) == (r,c);
    undecodable rows give null features."""
    import numpy as np

    from kenlm_rs_spark.ops.imagegen import make_png_patterned, pattern_pixels
    from kenlm_rs_spark.ops.multimodal import image_pooled_features

    w, h = 10, 6
    rows = [
        (0, bytearray(make_png_patterned(w, h, 2))),
        (1, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_pooled_features(df).collect()}
    px = pattern_pixels(w, h, 3)
    yb = (np.arange(h) * 4) // h
    xb = (np.arange(w) * 4) // w
    for r in range(4):
        for c in range(4):
            cell = px[yb == r][:, xb == c]
            want = float(cell.sum()) / cell.size
            assert abs(got[0][f"f{r}{c}"] - want) < 1e-12, (r, c)
    assert got[1]["format"] == "undecodable"
    assert all(got[1][f"f{r}{c}"] is None for r in range(4) for c in range(4))


def test_mp4_box_walk_roundtrip_and_edges():
    """ISO-BMFF metadata: synth->parse roundtrip (16.16 dims, mvhd
    duration/timescale), 64-bit-size box tolerance, non-BMFF rejection."""
    import struct

    from kenlm_rs_spark.ops.imagegen import make_mp4
    from kenlm_rs_spark.ops.multimodal import parse_video_metadata

    for w, h, d, ts in ((320, 240, 5000, 1000), (1920, 1080, 123456, 90000)):
        assert parse_video_metadata(make_mp4(w, h, d, ts)) == (w, h, ts, d)
    assert parse_video_metadata(b"garbage") is None
    assert parse_video_metadata(b"") is None
    # a free box with 64-bit size between ftyp and moov must be skipped
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    mp4 = make_mp4(64, 48, 100, 50)
    (ftyp_size,) = struct.unpack(">I", mp4[:4])
    assert parse_video_metadata(
        mp4[:ftyp_size] + free + mp4[ftyp_size:]
    )[0] == 64


def test_video_metadata_spark(spark):
    from kenlm_rs_spark.ops.imagegen import make_mp4
    from kenlm_rs_spark.ops.multimodal import video_metadata

    rows = [
        (0, bytearray(make_mp4(320, 240, 2100, 1000))),
        (1, bytearray(b"not video")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in video_metadata(df, fps=30).collect()}
    assert (got[0]["width"], got[0]["height"]) == (320, 240)
    assert got[0]["duration_s"] == 2.1
    # integer frame arithmetic: 2100 * 30 // 1000 = 63 (no float floor)
    assert got[0]["n_frames_30fps"] == 63
    assert got[1]["width"] is None
