"""MP4 frame extraction (ops/multimodal.parse_video_frames +
video_frame_stats) against the MJPEG-in-MP4 synthesizer
(ops/imagegen.make_mp4_mjpeg_patterned).

The demux test is byte-strength: extracted samples must EQUAL the JPEG
byte strings the synthesizer placed in mdat, across both the one-chunk
(nframes == 2) and the two-chunk non-contiguous layout (nframes >= 3).
Decode correctness then rides on the already-goldened JPEG decoder, but
one frame is additionally checked pixel-for-pixel against an
independently written block-value + JFIF conversion."""

import struct

import numpy as np
import pytest

from kenlm_rs_spark.ops.imagegen import (
    jpeg_block_value,
    make_jpeg_patterned,
    make_mp4_mjpeg_patterned,
    mjpeg_frame_dims,
)
from kenlm_rs_spark.ops.multimodal import (
    JPEG_B_CB,
    JPEG_G_CB,
    JPEG_G_CR,
    JPEG_R_CR,
    decode_pixels,
    parse_video_frames,
    parse_video_metadata,
)


def test_demux_returns_exact_sample_bytes():
    """One-chunk (id 0: 2 frames) and two-chunk (ids 1..3, 7: 3-5 frames)
    layouts both demux to the exact JPEG byte strings written into mdat."""
    for i in (0, 1, 2, 3, 7, 42, 99):
        nframes = 2 + i % 4
        expected = [
            make_jpeg_patterned(*mjpeg_frame_dims(i, k))
            for k in range(nframes)
        ]
        got = parse_video_frames(make_mp4_mjpeg_patterned(i))
        assert got == expected, i


def test_metadata_and_frames_agree():
    """The same payload satisfies BOTH parsers: parse_video_metadata reads
    first-frame dims from tkhd and nframes from mvhd (timescale 30, one
    unit per frame)."""
    for i in (0, 1, 5, 8):
        b = make_mp4_mjpeg_patterned(i)
        w, h, ts, dur = parse_video_metadata(b)
        assert (w, h) == mjpeg_frame_dims(i, 0)[:2]
        assert ts == 30
        assert dur == len(parse_video_frames(b))


def test_decoded_frame_matches_independent_conversion():
    """Frame (doc 0, k 0): 16x16 4:4:4 — every RGB pixel equals the
    independently computed jpeg_block_value + JFIF conversion."""
    frames = parse_video_frames(make_mp4_mjpeg_patterned(0))
    arr = decode_pixels(frames[0])
    assert arr.shape == (16, 16, 3)
    for yy in range(16):
        for xx in range(16):
            yv = jpeg_block_value(xx // 8, yy // 8, 0)
            cb = jpeg_block_value(xx // 8, yy // 8, 1) - 128.0
            cr = jpeg_block_value(xx // 8, yy // 8, 2) - 128.0
            r = min(255, max(0, np.floor(yv + float(JPEG_R_CR) * cr + 0.5)))
            g = min(255, max(0, np.floor(
                yv - float(JPEG_G_CB) * cb - float(JPEG_G_CR) * cr + 0.5)))
            bl = min(255, max(0, np.floor(yv + float(JPEG_B_CB) * cb + 0.5)))
            assert tuple(arr[yy, xx]) == (r, g, bl), (xx, yy)


def test_uniform_stsz_and_co64():
    """Hand-built track with uniform sample_size and 64-bit chunk offsets
    (co64): both code paths demux correctly."""
    frame = make_jpeg_patterned(16, 16, "444")
    sz = len(frame)

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = box(b"mdat", frame * 2)
    off = len(ftyp) + 8
    stsd = box(b"stsd", struct.pack(">II", 0, 0))
    stsc = box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, 2, 1))
    stsz = box(b"stsz", struct.pack(">I", 0) + struct.pack(">II", sz, 2))
    co64 = box(b"co64", struct.pack(">II", 0, 1) + struct.pack(">Q", off))
    stbl = box(b"stbl", stsd + stsc + stsz + co64)
    moov = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    got = parse_video_frames(ftyp + mdat + moov)
    assert got == [frame, frame]


def test_garbage_and_truncation():
    assert parse_video_frames(b"not a video at all") is None
    assert parse_video_frames(b"") is None
    b = make_mp4_mjpeg_patterned(1)  # 3 frames, two chunks
    # moov-after-mdat: cutting the tail removes the sample table entirely
    assert parse_video_frames(b[: len(b) - 40]) in (None, [])
    # a sample table pointing past EOF yields only the complete samples
    frames = parse_video_frames(b)
    truncated = b[: b.index(frames[2])] + b[b.index(frames[2]) + 10 :]
    # (structure is now inconsistent; must not raise)
    parse_video_frames(truncated[: len(truncated) - 200] + b[-600:])


def test_video_frame_stats_spark(spark):
    from kenlm_rs_spark.ops.multimodal import video_frame_stats

    rows = [
        (0, make_mp4_mjpeg_patterned(0)),  # 2 frames -> frame 0 sampled
        (3, make_mp4_mjpeg_patterned(3)),  # 5 frames -> frames 0, 2, 4
        (9, b"junk payload"),              # -> single null row
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = video_frame_stats(df, every_n=2)
    got = {(r["doc_id"], r["frame_idx"]): r for r in out.collect()}
    assert set(got) == {(0, 0), (3, 0), (3, 2), (3, 4), (9, None)}
    w, h, _ = mjpeg_frame_dims(3, 2)
    assert (got[(3, 2)]["width"], got[(3, 2)]["height"]) == (w, h)
    assert got[(9, None)]["mean_c0"] is None
    assert 0 <= got[(0, 0)]["px_min"] <= got[(0, 0)]["px_max"] <= 255
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        video_frame_stats(df, every_n=0)
