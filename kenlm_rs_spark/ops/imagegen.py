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


# ------------------------------------------------------- patterned pixels
#
# Deterministic nonzero pixel content so the REAL pixel decoders
# (ops/multimodal.decode_pixels) have something to verify against: pixel
# (x, y, channel) = (x*7 + y*13 + c*31) mod 256. The encoders below
# implement the PNG scanline filters / BMP row layout FORWARD, fully
# independently of the decoder's reverse implementations — a roundtrip
# equality is therefore a genuine cross-check of both, and a SQL oracle
# can recompute every statistic from the arithmetic alone.

import numpy as np


def pattern_pixels(w: int, h: int, channels: int) -> "np.ndarray":
    """(h, w, channels) uint8 with px[y, x, c] = (x*7 + y*13 + c*31) % 256."""
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(channels).reshape(1, 1, channels)
    return ((x * 7 + y * 13 + c * 31) % 256).astype(np.uint8)


def _png_filter_row(
    ftype: int, row: "np.ndarray", prev: "np.ndarray", bpp: int
) -> bytes:
    """FORWARD-apply one PNG scanline filter (PNG spec §9): row/prev are
    the reconstructed (original) bytes; returns the filtered bytes."""
    r = row.astype(np.int32)
    pv = prev.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:  # Sub
        out = (r - left) % 256
    elif ftype == 2:  # Up
        out = (r - pv) % 256
    elif ftype == 3:  # Average
        out = (r - (left + pv) // 2) % 256
    elif ftype == 4:  # Paeth
        # forward filtering reads only ORIGINAL bytes (no recurrence), so
        # the predictor vectorizes elementwise — unlike the decoder, where
        # left depends on already-reconstructed output
        ul = np.zeros_like(pv)
        ul[bpp:] = pv[:-bpp]
        p = left + pv - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - pv), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pv, ul)
        )
        out = (r - pred) % 256
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return out.astype(np.uint8).tobytes()


def make_png_patterned(w: int, h: int, color_type: int = 2) -> bytes:
    """Valid PNG with patterned pixels, cycling the scanline filter type
    y % 5 so every filter (None/Sub/Up/Average/Paeth) is exercised."""
    channels = PNG_CHANNELS[color_type]
    px = pattern_pixels(w, h, channels)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        ftype = y % 5
        raw.append(ftype)
        raw += _png_filter_row(ftype, row, prev, channels)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png_chunk(b"IEND", b"")
    )


def make_bmp_patterned(w: int, h: int) -> bytes:
    """Valid 24bpp BMP with patterned pixels: BGR byte order, bottom-up
    rows, 4-byte row padding — the layout quirks the decoder must undo."""
    px = pattern_pixels(w, h, 3)
    bgr = px[..., ::-1]
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        r = bgr[y].tobytes()
        rows.append(r + b"\x00" * (stride - len(r)))
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def lzw_encode_gif(indices: bytes, min_code_size: int) -> bytes:
    """REAL GIF-flavor LZW compression (GIF89a spec appendix F): variable
    code width starting min_code_size+1, LSB-first bit packing, Clear/EOI
    codes, dictionary grown per emitted string, reset at 4096. Written
    FORWARD, independently of the decoder in ops/multimodal.decode_pixels
    — the roundtrip test cross-checks both."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, nxt, width = fresh()
    emit(clear, width)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = nxt
        nxt += 1
        # the just-registered code must be representable in the width the
        # DECODER uses when it mirrors this registration one step later
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt > 4095:
            emit(clear, width)
            table, nxt, width = fresh()
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


GIF_PALETTE_MULS = (1, 2, 3)  # palette[i] = ((i, 2i, 3i) each % 256)


def make_gif_patterned(w: int, h: int) -> bytes:
    """Valid GIF89a with REAL LZW-compressed patterned pixels: 256-color
    global palette palette[i] = (i, 2i%256, 3i%256), index(x, y) =
    (7x + 13y) % 256 (pattern_pixels channel 0) — so a SQL oracle predicts
    every decoded-RGB statistic from doc_id arithmetic alone."""
    idx = pattern_pixels(w, h, 1).reshape(-1).tobytes()
    palette = bytes(
        (i * m) % 256 for i in range(256) for m in GIF_PALETTE_MULS
    )
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global 256-entry table
    img_desc = b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)
    stream = lzw_encode_gif(idx, 8)
    blocks = bytearray([8])  # min code size
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return b"GIF89a" + lsd + palette + img_desc + bytes(blocks) + b";"


def make_mp4(
    w: int, h: int, duration_units: int, timescale: int = 1000
) -> bytes:
    """Minimal valid ISO-BMFF (MP4) metadata stream: ftyp + moov[mvhd +
    trak[tkhd]] boxes per ISO/IEC 14496-12 — enough for any metadata
    parser (dims are 16.16 fixed-point in tkhd; duration/timescale in
    mvhd). No mdat/codec data: pixel/frame decode is the declared codec
    boundary, like JPEG scan data."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)                      # version/flags
        + struct.pack(">II", 0, 0)                # ctime mtime
        + struct.pack(">II", timescale, duration_units)
        + struct.pack(">I", 0x00010000)           # rate 1.0
        + struct.pack(">H", 0x0100)               # volume 1.0
        + b"\x00" * 10                            # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                            # pre_defined
        + struct.pack(">I", 2),                   # next_track_id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 7)                      # version/flags (enabled)
        + struct.pack(">II", 0, 0)                # ctime mtime
        + struct.pack(">I", 1)                    # track id
        + struct.pack(">I", 0)                    # reserved
        + struct.pack(">I", duration_units)
        + b"\x00" * 8                             # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)        # layer/group/volume/resv
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),   # 16.16 fixed dims
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


# ------------------------------------------------------------------ JPEG
# REAL baseline-sequential JPEG encoder for the constant-block pattern
# (VERDICT r5 item 4). Written FORWARD, independently of the decoder in
# ops/multimodal._decode_jpeg (roundtrip-tested, the GIF LZW discipline).
#
# Why constant 8x8 blocks: for a block whose spatial samples all equal v,
# the T.81 FDCT is DC-only with DC = 8*(v-128); with all-ones quant tables
# the coefficient survives quantization exactly, and ANY correct float64
# IDCT reproduces v to ~1e-13 before the +0.5 floor - so the decode is
# BIT-exact predictable from the block pattern alone, while the decoder
# still runs its full general path (marker parse, canonical Huffman,
# dequant, zigzag, IDCT, upsample, color convert). The SQL oracle
# recomputes every pixel from doc_id arithmetic without touching bytes
# (the ops/imagegen arithmetic-oracle pattern).

# canonical DC Huffman table (T.81 Annex K.3.1, public): categories 0..11
JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
JPEG_DC_VALS = bytes(range(12))
# compact valid AC table: EOB, (run,size) 01/11/02/21/12/31, ZRL - enough
# for DC-only streams plus the AC/ZRL decode paths the tests exercise
JPEG_AC_BITS = [0, 2, 1, 5, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
JPEG_AC_VALS = bytes(
    [0x00, 0x01, 0x11, 0xF0, 0x02, 0x21, 0x12, 0x31, 0x22, 0x32]
)


def _jpeg_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF byte stuffing; pads the tail with 1s
    (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _dht_segment(tc: int, th: int, bits: list[int], vals: bytes) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + vals
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _encode_block_dc(
    w: "_JpegBitWriter", dc: int, pred: int,
    dc_codes: dict, ac_codes: dict, ac_coefs=None,
) -> int:
    """Encode one block: DC diff (category + magnitude bits) then AC
    (run,size) symbols from the sparse {zigzag_index: value} dict (default
    empty = immediate EOB). Returns the new DC predictor."""
    diff = dc - pred
    t = abs(diff).bit_length()
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        w.write(v, t)
    coefs = ac_coefs or {}
    k = 1
    for idx in sorted(coefs):
        run = idx - k
        while run >= 16:
            zc, zl = ac_codes[0xF0]
            w.write(zc, zl)
            run -= 16
        val = coefs[idx]
        s = abs(val).bit_length()
        c, ln2 = ac_codes[(run << 4) | s]
        w.write(c, ln2)
        v = val if val >= 0 else val + (1 << s) - 1
        w.write(v, s)
        k = idx + 1
    if k < 64:
        ec, el = ac_codes[0x00]
        w.write(ec, el)
    return dc


def jpeg_block_value(bx: int, by: int, comp: int) -> int:
    """Constant sample value of block (bx, by) of component comp — the
    shared arithmetic the SQL oracle recomputes (comp 0=Y, 1=Cb, 2=Cr)."""
    if comp == 0:
        return (7 * bx + 13 * by) % 256
    if comp == 1:
        return (11 * bx + 17 * by + 8) % 256
    return (5 * bx + 19 * by + 16) % 256


def make_jpeg_patterned(
    w: int, h: int, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Valid baseline-sequential JPEG (SOI/DQT/DHT/SOF0/[DRI]/SOS/EOI) with
    all-ones quant tables and constant-per-block planes from
    jpeg_block_value. ``subsampling`` is '444' (chroma blocks cover 8x8
    pixels) or '420' (2x2 Y blocks per MCU, chroma blocks cover 16x16
    pixels). Dims must be multiples of 16 so MCU edges never crop."""
    if w % 16 or h % 16:
        raise ValueError("make_jpeg_patterned needs dims that are multiples of 16")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hv_y = 0x22 if subsampling == "420" else 0x11

    dqt = (
        b"\xff\xdb" + struct.pack(">H", 2 + 2 * 65)
        + b"\x00" + bytes([1] * 64) + b"\x01" + bytes([1] * 64)
    )
    dht = (
        _dht_segment(0, 0, JPEG_DC_BITS, JPEG_DC_VALS)
        + _dht_segment(1, 0, JPEG_AC_BITS, JPEG_AC_VALS)
        + _dht_segment(0, 1, JPEG_DC_BITS, JPEG_DC_VALS)
        + _dht_segment(1, 1, JPEG_AC_BITS, JPEG_AC_VALS)
    )
    sof_body = struct.pack(">BHHB", 8, h, w, 3) + b"".join(
        struct.pack(">BBB", cid, hv, tq)
        for cid, hv, tq in ((1, hv_y, 0), (2, 0x11, 1), (3, 0x11, 1))
    )
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    sos_body = b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00"
    sos = b"\xff\xda" + struct.pack(">H", 2 + len(sos_body)) + sos_body

    dc_codes = _jpeg_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_codes = _jpeg_codes(JPEG_AC_BITS, JPEG_AC_VALS)

    def dc_of(comp: int, bx: int, by: int) -> int:
        return 8 * (jpeg_block_value(bx, by, comp) - 128)

    scan = bytearray()
    writer = _JpegBitWriter()
    pred = [0, 0, 0]
    if subsampling == "420":
        mcus_x, mcus_y = w // 16, h // 16
    else:
        mcus_x, mcus_y = w // 8, h // 8
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu > 0 and mcu % restart_interval == 0:
            scan += writer.flush()
            scan += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _JpegBitWriter()
            pred = [0, 0, 0]
        my, mx = divmod(mcu, mcus_x)
        if subsampling == "420":
            for dy in range(2):
                for dx in range(2):
                    pred[0] = _encode_block_dc(
                        writer, dc_of(0, 2 * mx + dx, 2 * my + dy), pred[0],
                        dc_codes, ac_codes,
                    )
            for comp in (1, 2):
                pred[comp] = _encode_block_dc(
                    writer, dc_of(comp, mx, my), pred[comp], dc_codes, ac_codes
                )
        else:
            for comp in (0, 1, 2):
                pred[comp] = _encode_block_dc(
                    writer, dc_of(comp, mx, my), pred[comp], dc_codes, ac_codes
                )
    scan += writer.flush()
    return (
        b"\xff\xd8" + dqt + dht + sof0 + dri + sos + bytes(scan) + b"\xff\xd9"
    )


def make_jpeg_gray_coeffs(coefs: dict[int, int]) -> bytes:
    """Single-block grayscale baseline JPEG whose one 8x8 block carries the
    given sparse {zigzag_index: coefficient} map (DC at index 0) — lets
    tests exercise the decoder's AC run/size, ZRL and EXTEND paths against
    an independently computed IDCT."""
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes([1] * 64)
    dht = (
        _dht_segment(0, 0, JPEG_DC_BITS, JPEG_DC_VALS)
        + _dht_segment(1, 0, JPEG_AC_BITS, JPEG_AC_VALS)
    )
    sof_body = struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    sos_body = b"\x01" + b"\x01\x00" + b"\x00\x3f\x00"
    sos = b"\xff\xda" + struct.pack(">H", 2 + len(sos_body)) + sos_body
    dc_codes = _jpeg_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_codes = _jpeg_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    writer = _JpegBitWriter()
    ac = {k: v for k, v in coefs.items() if k != 0}
    _encode_block_dc(writer, coefs.get(0, 0), 0, dc_codes, ac_codes, ac)
    return b"\xff\xd8" + dqt + dht + sof0 + sos + writer.flush() + b"\xff\xd9"


# ----------------------------------------------------------- MJPEG-in-MP4
# A playable-shape ISO-BMFF file whose track samples are REAL baseline
# JPEGs (make_jpeg_patterned) — the composition that retires the "MP4
# frame extraction" declared boundary: the sample table (stsc/stsz/stco)
# is written forward here and walked back independently by
# ops/multimodal.parse_video_frames, and every extracted frame goes
# through the full JPEG decoder. Chunk offsets are deliberately
# NON-contiguous (deterministic padding between the two chunks) so the
# chunk map genuinely matters.


def _bmff_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def mjpeg_frame_dims(doc_id: int, k: int) -> tuple[int, int, str]:
    """Shared arithmetic for frame k of doc doc_id: width, height and
    chroma subsampling — the SQL oracle replays exactly this."""
    w = 16 * (1 + (doc_id + k) % 3)
    h = 16 * (1 + (doc_id + 2 * k) % 2)
    sub = "444" if (doc_id + k) % 2 == 0 else "420"
    return w, h, sub


def make_mp4_mjpeg_patterned(doc_id: int) -> bytes:
    """Valid ISO-BMFF (ftyp + mdat + moov[mvhd, trak[tkhd, mdia[mdhd,
    hdlr, minf[stbl[stsd('jpeg'), stts, stsc, stsz, stco]]]]]) whose
    2 + doc_id%4 samples are constant-block baseline JPEGs
    (jpeg_block_value planes, per-frame dims from mjpeg_frame_dims).
    Samples split into two chunks when nframes >= 3, with 7 + doc_id%5
    padding bytes between them inside mdat, so stco carries two
    non-contiguous absolute offsets; timescale 30, one unit per frame."""
    nframes = 2 + doc_id % 4
    frames = [
        make_jpeg_patterned(*mjpeg_frame_dims(doc_id, k)[:2],
                            mjpeg_frame_dims(doc_id, k)[2])
        for k in range(nframes)
    ]
    sizes = [len(f) for f in frames]
    pad = bytes(7 + doc_id % 5)
    two_chunks = nframes >= 3
    if two_chunks:
        chunk1, chunk2 = frames[:2], frames[2:]
        mdat_payload = b"".join(chunk1) + pad + b"".join(chunk2)
    else:
        chunk1, chunk2 = frames, []
        mdat_payload = b"".join(chunk1)

    ftyp = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_off = len(ftyp) + 8  # absolute offset of mdat payload
    mdat = _bmff_box(b"mdat", mdat_payload)

    offsets = [mdat_off]
    if two_chunks:
        offsets.append(mdat_off + sum(sizes[:2]) + len(pad))

    w0, h0, _ = mjpeg_frame_dims(doc_id, 0)
    timescale = 30
    mvhd = _bmff_box(
        b"mvhd",
        struct.pack(">I", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, nframes)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _bmff_box(
        b"tkhd",
        struct.pack(">I", 7) + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1) + struct.pack(">I", 0)
        + struct.pack(">I", nframes) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w0 << 16, h0 << 16),
    )
    mdhd = _bmff_box(
        b"mdhd",
        struct.pack(">I", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, nframes)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _bmff_box(
        b"hdlr",
        struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12
        + b"MJPEG\x00",
    )
    # VisualSampleEntry 'jpeg' per ISO/IEC 14496-12 §12.1.3
    sample_entry = _bmff_box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref idx
        + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined/reserved
        + struct.pack(">HH", w0, h0)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # resv + frame_count
        + b"\x00" * 32                                 # compressorname
        + struct.pack(">Hh", 24, -1),                  # depth, pre_defined
    )
    stsd = _bmff_box(
        b"stsd", struct.pack(">I", 0) + struct.pack(">I", 1) + sample_entry
    )
    stts = _bmff_box(
        b"stts",
        struct.pack(">I", 0) + struct.pack(">I", 1)
        + struct.pack(">II", nframes, 1),
    )
    if two_chunks:
        stsc_entries = [(1, 2, 1), (2, nframes - 2, 1)]
    else:
        stsc_entries = [(1, nframes, 1)]
    stsc = _bmff_box(
        b"stsc",
        struct.pack(">I", 0) + struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _bmff_box(
        b"stsz",
        struct.pack(">I", 0) + struct.pack(">I", 0)
        + struct.pack(">I", nframes)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _bmff_box(
        b"stco",
        struct.pack(">I", 0) + struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _bmff_box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _bmff_box(b"minf", stbl)
    mdia = _bmff_box(b"mdia", mdhd + hdlr + minf)
    trak = _bmff_box(b"trak", tkhd + mdia)
    moov = _bmff_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
