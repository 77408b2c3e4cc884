"""Audio columns: REAL RIFF/WAVE parsing and PCM decode with pure stdlib —
the audio twin of ops/multimodal's image path (opaque binary column ->
typed metadata + sample statistics via mapInPandas, no audio library).

WAV is the one audio container whose payload needs no codec: the RIFF
chunk walk (fmt / data) is struct.unpack, and PCM samples are fixed-width
integers. Everything downstream of a codec (MP3/AAC/Opus) is out of scope
the same way JPEG entropy decode is for images — a declared
NotImplementedError, with the Spark-side contract (schema, Arrow batching,
partitioning) identical to what a production decoder slots into.

The synthesizer writes the chunk structure FORWARD and the parser walks it
in reverse-independent code, so roundtrip equality cross-checks both; the
sample pattern s(i, c) = ((i*17 + c*29) mod 4001) - 2000 lets a SQL oracle
recompute every statistic arithmetically (integer sums -> exact rationals;
rms goes through one IEEE-exact sqrt).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def make_wav_patterned(
    n_frames: int, channels: int = 1, sample_rate: int = 16000
) -> bytes:
    """Valid 16-bit PCM WAV: RIFF header + fmt chunk + data chunk, samples
    from the arithmetic pattern (interleaved frames)."""
    i = np.arange(n_frames).reshape(-1, 1)
    c = np.arange(channels).reshape(1, -1)
    samples = ((i * 17 + c * 29) % 4001 - 2000).astype("<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """(sample_rate, channels, bits, samples[frames, channels]) from a
    RIFF/WAVE payload — a real chunk walk (fmt may be preceded by other
    chunks; data length is honored). PCM 16-bit signed and 8-bit unsigned
    only; compressed format tags raise NotImplementedError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_info = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[0:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV format tag {audio_fmt}: only PCM (1) decodes "
                    "without a codec"
                )
            if bits not in (8, 16):
                raise NotImplementedError(f"PCM bits={bits}: only 8/16")
            fmt_info = (rate, channels, bits)
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt_info is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    rate, channels, bits = fmt_info
    if bits == 16:
        arr = np.frombuffer(pcm[: len(pcm) // 2 * 2], dtype="<i2")
    else:
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128
    frames = arr.shape[0] // channels
    return rate, channels, bits, arr[: frames * channels].reshape(
        frames, channels
    ).astype(np.int32)


AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate long, channels long, bits long, "
    "n_frames long, duration_s double, mean_amp double, rms double, "
    "peak long"
)


def audio_pcm_stats(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """binary -> per-clip PCM statistics in one Arrow stage: duration,
    exact mean amplitude (integer sum / count), RMS (sqrt of an exact
    integer rational — IEEE-exact, engine-reproducible), absolute peak.
    Undecodable payloads yield null stats (total operator)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                try:
                    rate, channels, bits, samples = parse_wav(b)
                except (NotImplementedError, ValueError, struct.error):
                    rows.append(
                        dict(
                            doc_id=int(i), sample_rate=None, channels=None,
                            bits=None, n_frames=None, duration_s=None,
                            mean_amp=None, rms=None, peak=None,
                        )
                    )
                    continue
                flat = samples.reshape(-1).astype(np.int64)
                n = flat.shape[0]
                s1 = int(flat.sum())
                s2 = int((flat * flat).sum())
                rows.append(
                    dict(
                        doc_id=int(i),
                        sample_rate=rate,
                        channels=channels,
                        bits=bits,
                        n_frames=samples.shape[0],
                        duration_s=samples.shape[0] / rate,
                        mean_amp=s1 / n if n else None,
                        rms=float(np.sqrt(s2 / n)) if n else None,
                        peak=int(np.abs(flat).max()) if n else None,
                    )
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(gen, schema=AUDIO_STATS_SCHEMA)
