"""Audio columns: REAL RIFF/WAVE parsing and PCM decode with pure stdlib —
the audio twin of ops/multimodal's image path (opaque binary column ->
typed metadata + sample statistics via mapInPandas, no audio library).

WAV is the one audio container whose payload needs no codec: the RIFF
chunk walk (fmt / data) is struct.unpack, and PCM samples are fixed-width
integers. MPEG audio (MP3) frame HEADERS are also plain bit fields, so
duration/bitrate/channel metadata parses for real (parse_mp3 below) —
only the Huffman-coded samples themselves (and AAC/Opus entirely) remain
a declared NotImplementedError, with the Spark-side contract (schema,
Arrow batching, partitioning) identical to what a production decoder
slots into.

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


# --------------------------------------------------------------------- MP3
#
# MPEG audio framing (ISO/IEC 11172-3 §2.4 / 13818-3 for the LSF variant):
# the frame HEADERS are plain bit fields, so duration / bitrate / channel
# metadata for the web's dominant audio format needs no entropy decode at
# all — the audio twin of JPEG's "headers are real, pixels need a codec"
# boundary, except here the metadata walk IS the useful operator (corpus
# audio stats, clip-length filters, VBR detection). Huffman-coded samples
# stay a declared codec boundary.

# MPEG1 Layer III bitrate table, kbps, index 1..14 (0 = free, 15 = bad)
MP3_BITRATES_V1L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
# MPEG2/2.5 Layer III (lower-sampling-frequency) table
MP3_BITRATES_V2L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
MP3_RATES_V1 = (44100, 48000, 32000)
MP3_RATES_V2 = (22050, 24000, 16000)
MP3_CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _synchsafe(n: int) -> bytes:
    """ID3v2 synchsafe 28-bit size: 4 bytes, 7 bits each, MSB clear."""
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def make_mp3_patterned(doc_id: int) -> bytes:
    """Valid MPEG1 Layer III frame stream from doc_id arithmetic (headers +
    zero-filled frame bodies — no codec needed to WRITE silence):
    nframes = 3 + id%7, samplerate index id%3, per-frame bitrate index
    (id + k%(1 + id%3)) % 14 + 1 — a true CBR stream when id%3 == 0 and
    VBR otherwise, so the VBR flag carries signal — padding bit (id+k)%2,
    channel mode id%4; an ID3v2.4 tag of 10 + id%50 bytes is prepended
    when id%5 == 0. A SQL oracle predicts every metadata field from the
    same arithmetic."""
    out = bytearray()
    if doc_id % 5 == 0:
        body = bytes(doc_id % 50)
        out += b"ID3\x04\x00\x00" + _synchsafe(len(body)) + body
    sr_idx = doc_id % 3
    sr = MP3_RATES_V1[sr_idx]
    mode = doc_id % 4
    for k in range(3 + doc_id % 7):
        br_idx = (doc_id + k % (1 + doc_id % 3)) % 14 + 1
        pad = (doc_id + k) % 2
        kbps = MP3_BITRATES_V1L3[br_idx]
        # sync(11) | version=11 | layer=01 | protection=1 (no CRC)
        b0, b1 = 0xFF, 0xFB
        b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
        b3 = mode << 6
        frame_len = (144000 * kbps) // sr + pad
        out += bytes([b0, b1, b2, b3]) + bytes(frame_len - 4)
    return bytes(out)


def parse_mp3(data: bytes) -> dict:
    """Walk an MPEG Layer III frame stream (MPEG1 and MPEG2-LSF): skip any
    ID3v2 tag (synchsafe size), then parse each 4-byte header, derive the
    frame length ((144000|72000)*kbps//rate + padding) and hop to the next
    sync word. Returns n_frames, sample_rate, channel_mode, samples/frame,
    per-frame kbps list, id3 presence/size, walked byte count. Raises
    ValueError on a stream with no valid first frame; free-format
    (bitrate index 0) raises NotImplementedError (frame length is not
    derivable without scanning for the next sync)."""
    pos = 0
    has_id3 = False
    id3_size = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        sz = data[6:10]
        if max(sz) < 0x80:
            has_id3 = True
            id3_size = (
                (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
            ) + 10
            pos = id3_size
    n_frames = 0
    sample_rate = None
    mode_name = None
    spf = None
    kbps_list: list[int] = []
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # lost sync: stop at trailing junk
        version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x3  # 1 = Layer III
        if version == 1 or layer == 0:
            raise ValueError("reserved MPEG version/layer bits")
        if layer != 1:
            raise NotImplementedError(
                f"layer bits {layer}: only Layer III framing is implemented"
            )
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 0x1
        if br_idx == 0:
            raise NotImplementedError("free-format bitrate (index 0)")
        if br_idx == 0xF or sr_idx == 3:
            raise ValueError("invalid bitrate/samplerate index")
        if version == 3:
            kbps = MP3_BITRATES_V1L3[br_idx]
            rate = MP3_RATES_V1[sr_idx]
            coeff, spf_v = 144000, 1152
        else:
            kbps = MP3_BITRATES_V2L3[br_idx]
            rate = MP3_RATES_V2[sr_idx]
            if version == 0:  # MPEG2.5: half the MPEG2 rates
                rate //= 2
            coeff, spf_v = 72000, 576
        if sample_rate is None:
            sample_rate = rate
            spf = spf_v
            mode_name = MP3_CHANNEL_MODES[(b3 >> 6) & 0x3]
        frame_len = (coeff * kbps) // rate + pad
        if pos + frame_len > len(data):
            break  # truncated final frame: count only complete frames
        kbps_list.append(kbps)
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no valid MPEG audio frame")
    return dict(
        n_frames=n_frames,
        sample_rate=sample_rate,
        samples_per_frame=spf,
        channel_mode=mode_name,
        kbps_list=kbps_list,
        has_id3=has_id3,
        id3_size=id3_size,
        walked_bytes=pos,
    )


MP3_METADATA_SCHEMA = (
    "doc_id long, n_frames long, sample_rate long, channel_mode string, "
    "duration_s double, avg_bitrate_kbps double, is_vbr boolean, "
    "has_id3 boolean, id3_size long, stream_bytes long"
)


def mp3_metadata(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """binary -> per-clip MPEG audio metadata in one Arrow stage (no
    shuffle): frame count, sample rate, channel mode, duration
    (n_frames * samples_per_frame / rate — one IEEE division), exact-mean
    average bitrate, VBR flag, ID3 presence, walked stream bytes.
    Undecodable payloads yield null fields (total operator)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                try:
                    m = parse_mp3(b)
                except (NotImplementedError, ValueError, IndexError):
                    rows.append(
                        dict(
                            doc_id=int(i), n_frames=None, sample_rate=None,
                            channel_mode=None, duration_s=None,
                            avg_bitrate_kbps=None, is_vbr=None,
                            has_id3=None, id3_size=None, stream_bytes=None,
                        )
                    )
                    continue
                ks = m["kbps_list"]
                rows.append(
                    dict(
                        doc_id=int(i),
                        n_frames=m["n_frames"],
                        sample_rate=m["sample_rate"],
                        channel_mode=m["channel_mode"],
                        duration_s=(
                            m["n_frames"] * m["samples_per_frame"]
                        ) / m["sample_rate"],
                        avg_bitrate_kbps=sum(ks) / len(ks),
                        is_vbr=len(set(ks)) > 1,
                        has_id3=m["has_id3"],
                        id3_size=m["id3_size"],
                        stream_bytes=m["walked_bytes"],
                    )
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(gen, schema=MP3_METADATA_SCHEMA)
