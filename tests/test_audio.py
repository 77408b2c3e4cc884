"""WAV/PCM audio path (ops/audio.py): synth->parse roundtrips, chunk-walk
robustness, codec boundaries, and the audio_pcm_stats Spark operator."""

import struct

import numpy as np
import pytest


def test_wav_roundtrip_pattern():
    from kenlm_rs_spark.ops.audio import make_wav_patterned, parse_wav

    for frames, ch, rate in ((1, 1, 8000), (100, 2, 16000), (311, 1, 44100)):
        r, c, bits, samples = parse_wav(make_wav_patterned(frames, ch, rate))
        assert (r, c, bits) == (rate, ch, 16)
        i = np.arange(frames).reshape(-1, 1)
        cc = np.arange(ch).reshape(1, -1)
        want = (i * 17 + cc * 29) % 4001 - 2000
        assert samples.shape == (frames, ch)
        assert (samples == want).all()


def test_wav_chunk_walk_skips_extra_chunks():
    """fmt preceded by a LIST chunk and followed by an odd-length chunk
    (word alignment) must still parse."""
    from kenlm_rs_spark.ops.audio import make_wav_patterned, parse_wav

    base = make_wav_patterned(4, 1, 8000)
    chunks = base[12:]  # fmt + data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + len(extra) + len(chunks))
        + b"WAVE"
        + extra
        + chunks
    )
    r, c, bits, samples = parse_wav(wav)
    assert (r, c, samples.shape[0]) == (8000, 1, 4)


def test_wav_codec_boundary():
    """Non-PCM format tags (e.g. 85 = MP3-in-WAV) raise NotImplementedError;
    non-RIFF bytes raise ValueError."""
    from kenlm_rs_spark.ops.audio import make_wav_patterned, parse_wav

    wav = bytearray(make_wav_patterned(4, 1, 8000))
    # fmt chunk body starts at 20; audio format tag is its first u16
    wav[20:22] = struct.pack("<H", 85)
    with pytest.raises(NotImplementedError):
        parse_wav(bytes(wav))
    with pytest.raises(ValueError):
        parse_wav(b"not audio")


def test_audio_pcm_stats_spark(spark):
    from kenlm_rs_spark.ops.audio import audio_pcm_stats, make_wav_patterned

    rows = [
        (0, bytearray(make_wav_patterned(200, 2, 16000))),
        (1, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_pcm_stats(df).collect()}
    i = np.arange(200).reshape(-1, 1)
    c = np.arange(2).reshape(1, -1)
    flat = ((i * 17 + c * 29) % 4001 - 2000).reshape(-1).astype(np.int64)
    assert got[0]["n_frames"] == 200 and got[0]["channels"] == 2
    assert got[0]["duration_s"] == 200 / 16000
    assert abs(got[0]["mean_amp"] - flat.sum() / flat.size) < 1e-12
    assert abs(got[0]["rms"] - np.sqrt((flat * flat).sum() / flat.size)) < 1e-9
    assert got[0]["peak"] == int(np.abs(flat).max())
    assert got[1]["sample_rate"] is None
    plan = audio_pcm_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------------------------- MP3 walk


def test_mp3_roundtrip_metadata_matches_arithmetic():
    """parse_mp3(make_mp3_patterned(id)) reproduces every field the doc_id
    arithmetic predicts — CBR ids (id%3==0) and VBR ids, with/without ID3."""
    from kenlm_rs_spark.ops.audio import (
        MP3_BITRATES_V1L3,
        MP3_CHANNEL_MODES,
        MP3_RATES_V1,
        make_mp3_patterned,
        parse_mp3,
    )

    for i in (0, 1, 2, 3, 5, 6, 10, 14, 29, 97, 123):
        m = parse_mp3(make_mp3_patterned(i))
        nf = 3 + i % 7
        sr = MP3_RATES_V1[i % 3]
        ks = [
            MP3_BITRATES_V1L3[(i + k % (1 + i % 3)) % 14 + 1]
            for k in range(nf)
        ]
        assert m["n_frames"] == nf, i
        assert m["sample_rate"] == sr, i
        assert m["channel_mode"] == MP3_CHANNEL_MODES[i % 4], i
        assert m["kbps_list"] == ks, i
        assert m["has_id3"] == (i % 5 == 0), i
        if i % 5 == 0:
            assert m["id3_size"] == 10 + i % 50, i
        body = sum((144000 * k) // sr + (i + j) % 2 for j, k in enumerate(ks))
        assert m["walked_bytes"] == m["id3_size"] + body, i
        # CBR exactly when id%3 == 0 (k % 1 == 0 pins the bitrate index)
        assert (len(set(ks)) == 1) == (i % 3 == 0), i


def test_mp3_hand_golden_header():
    """Hand-assembled single frame: 0xFF 0xFB 0x92 0xC0 = MPEG1 LIII,
    bitrate idx 9 (128kbps), rate idx 0 (44100), padding 1, mode mono(3):
    frame length = 144000*128//44100 + 1 = 418 bytes."""
    from kenlm_rs_spark.ops.audio import parse_mp3

    frame = bytes([0xFF, 0xFB, 0x92, 0xC0]) + bytes(414)
    m = parse_mp3(frame)
    assert m["n_frames"] == 1
    assert m["sample_rate"] == 44100
    assert m["kbps_list"] == [128]
    assert m["channel_mode"] == "mono"
    assert m["walked_bytes"] == 418


def test_mp3_mpeg2_lsf_frame():
    """MPEG2 Layer III (version bits 10 -> 0xF3): coeff 72000, spf 576,
    LSF bitrate table, LSF rates. idx 4 = 32 kbps at 22050 Hz ->
    72000*32//22050 = 104 bytes, no padding."""
    from kenlm_rs_spark.ops.audio import parse_mp3

    frame = bytes([0xFF, 0xF3, 0x40, 0x00]) + bytes(100)
    m = parse_mp3(frame)
    assert m["n_frames"] == 1
    assert m["sample_rate"] == 22050
    assert m["samples_per_frame"] == 576
    assert m["kbps_list"] == [32]


def test_mp3_truncated_final_frame_counts_complete_only():
    from kenlm_rs_spark.ops.audio import make_mp3_patterned, parse_mp3

    full = make_mp3_patterned(7)
    whole = parse_mp3(full)
    cut = parse_mp3(full[:-10])
    assert cut["n_frames"] == whole["n_frames"] - 1


def test_mp3_error_paths():
    import pytest

    from kenlm_rs_spark.ops.audio import parse_mp3

    with pytest.raises(ValueError):
        parse_mp3(b"not audio")
    # reserved version bits (01 -> 0xEB)
    with pytest.raises(ValueError):
        parse_mp3(bytes([0xFF, 0xEB, 0x92, 0xC0]) + bytes(500))
    # Layer II (bits 10 -> 0xFD) is a declared boundary
    with pytest.raises(NotImplementedError):
        parse_mp3(bytes([0xFF, 0xFD, 0x92, 0xC0]) + bytes(500))
    # free-format bitrate index 0
    with pytest.raises(NotImplementedError):
        parse_mp3(bytes([0xFF, 0xFB, 0x02, 0xC0]) + bytes(500))


def test_mp3_metadata_spark_total(spark):
    from kenlm_rs_spark.ops.audio import make_mp3_patterned, mp3_metadata

    rows = [
        (0, bytearray(make_mp3_patterned(0))),
        (4, bytearray(make_mp3_patterned(4))),
        (9, bytearray(b"\x00\x01garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mp3_metadata(df).collect()}
    assert got[0]["is_vbr"] is False and got[0]["has_id3"] is True
    assert got[4]["is_vbr"] is True and got[4]["has_id3"] is False
    assert got[9]["n_frames"] is None
    plan = mp3_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
