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
