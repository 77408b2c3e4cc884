"""Synthetic REAL image bytes (valid PNG/GIF/BMP, structurally valid JPEG
header stream) built with pure stdlib per the public container specs — used
to exercise the real header parsers (ops/multimodal.parse_image_header) in
tests, fixtures and the driver-gate query without any image library."""

from __future__ import annotations

import struct
import zlib

PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png(w: int, h: int, color_type: int = 2) -> bytes:
    """Complete valid PNG: signature + IHDR + IDAT (deflated zero scanlines
    with filter byte 0) + IEND."""
    channels = PNG_CHANNELS[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (w * channels)) * h
    return (
        b"\x89PNG\r\n\x1a\n"
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"IDAT", zlib.compress(raw))
        + png_chunk(b"IEND", b"")
    )


def make_gif(w: int, h: int) -> bytes:
    """Valid GIF89a: logical screen descriptor + 2-color global palette +
    one image block (trivial LZW stream) + trailer."""
    lsd = struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    palette = b"\x00\x00\x00\xff\xff\xff"
    img_desc = b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
    img_data = b"\x02" + b"\x02\x44\x01" + b"\x00"
    return b"GIF89a" + lsd + palette + img_desc + img_data + b";"


def make_jpeg(w: int, h: int, ncomp: int = 3) -> bytes:
    """Structurally valid JPEG header stream: SOI + APP0(JFIF) + DQT + SOF0
    + EOI (no scan data — header parsers never need it)."""
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp)
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def make_bmp(w: int, h: int) -> bytes:
    """Valid BMP: BITMAPFILEHEADER + BITMAPINFOHEADER(40) + 24bpp zero rows."""
    row = (w * 3 + 3) & ~3
    pixels = b"\x00" * (row * h)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def make_webp_vp8l(w: int, h: int, alpha: bool = False) -> bytes:
    """Minimal VP8L (lossless WEBP) header stream: RIFF/WEBP container +
    0x2F signature + packed 14-bit (w-1, h-1) dims + alpha bit."""
    bits = (w - 1) | ((h - 1) << 14) | ((1 if alpha else 0) << 28)
    payload = b"\x2f" + struct.pack("<I", bits) + b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_webp_vp8x(w: int, h: int, alpha: bool = False) -> bytes:
    """Minimal VP8X (extended WEBP) header: flag byte + 24-bit (w-1, h-1)."""
    payload = (
        bytes([0x10 if alpha else 0x00])
        + b"\x00\x00\x00"
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_webp_vp8(w: int, h: int) -> bytes:
    """Minimal lossy VP8 keyframe header: 3-byte frame tag + 9d 01 2a start
    code + 14-bit u16le dims."""
    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def synth_image_bytes(doc_id: int) -> bytes:
    """Deterministic real-image payload for a doc_id: format cycles
    png/gif/jpeg, dims are pure arithmetic of doc_id — so a SQL oracle can
    predict (width, height, channels, format) without parsing anything."""
    w = 16 + doc_id % 317
    h = 16 + (doc_id * 7) % 211
    fmt = doc_id % 3
    if fmt == 0:
        return make_png(w, h, color_type=2)
    if fmt == 1:
        return make_gif(w, h)
    return make_jpeg(w, h, ncomp=3)
