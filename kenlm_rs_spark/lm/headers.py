"""KenLM binary-format header readers.

Byte layout per the reference (/root/reference/src/cxx/lm/binary_format.cc:52-93
and the Rust twins /root/reference/src/headers/{sanity.rs,fixed_width_params.rs,
counts.rs}):

    bytes 0..87    Sanity: magic (56 = ALIGN8 of the 53-byte magic string),
                   floats 0.0/1.0/-0.5, u32 1 / u32 max / u32 pad, u64 1
    bytes 88..107  FixedWidthParameters: order u8 (+3 pad), probing_multiplier
                   f32, model_type u32, has_vocabulary u8 (+3 pad),
                   search_version u32
    bytes 108..    order x u64 n-gram counts (little-endian)
    header_size = ALIGN8(88 + 20 + 8*order)   (headers/mod.rs:112-124)
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

MAGIC_BYTES = b"mmap lm http://kheafield.com/code format version 5\n\x00"
MAGIC_INCOMPLETE = b"mmap lm http://kheafield.com/code incomplete\n"

SANITY_SIZE = 88
FIXED_SIZE = 20

# model types (/root/reference/src/cxx/lm/model_type.hh:12-20)
PROBING = 0
REST_PROBING = 1
TRIE = 2
QUANT_TRIE = 3
ARRAY_TRIE = 4
QUANT_ARRAY_TRIE = 5

MODEL_NAMES = {
    PROBING: "probing hash tables",
    REST_PROBING: "probing hash tables with rest costs",
    TRIE: "trie",
    QUANT_TRIE: "trie with quantization",
    ARRAY_TRIE: "trie with array-compressed pointers",
    QUANT_ARRAY_TRIE: "trie with quantization and array-compressed pointers",
}


def align8(size: int) -> int:
    return ((size - 1) // 8 + 1) * 8


def reference_sanity() -> bytes:
    """The 88-byte reference Sanity block (binary_format.cc:52-71)."""
    magic = MAGIC_BYTES + b"\x00" * (align8(len(MAGIC_BYTES)) - len(MAGIC_BYTES))
    return magic + struct.pack("<fffIIIQ", 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 0, 1)


class BinaryFormatError(ValueError):
    pass


class NotBinaryFormat(BinaryFormatError):
    """The file does not start with the KenLM mmap magic — try ARPA."""


@dataclass(frozen=True)
class FixedParameters:
    order: int
    probing_multiplier: float
    model_type: int
    has_vocabulary: bool
    search_version: int


@dataclass(frozen=True)
class BinaryHeaders:
    fixed: FixedParameters
    counts: list[int]

    @property
    def header_size(self) -> int:
        return total_header_size(self.fixed.order)


def total_header_size(order: int) -> int:
    return align8(SANITY_SIZE + FIXED_SIZE + 8 * order)


def check_sanity(data: bytes) -> None:
    ref = reference_sanity()
    if len(data) < SANITY_SIZE or data[:SANITY_SIZE] != ref:
        if data.startswith(MAGIC_INCOMPLETE):
            raise BinaryFormatError("binary file did not finish building")
        raise NotBinaryFormat("sanity header mismatch")


def parse_fixed(data: bytes) -> FixedParameters:
    order = data[0]
    (probing_multiplier,) = struct.unpack_from("<f", data, 4)
    (model_type,) = struct.unpack_from("<I", data, 8)
    has_vocabulary = data[12] != 0
    (search_version,) = struct.unpack_from("<I", data, 16)
    if probing_multiplier < 1.0:
        raise BinaryFormatError(
            f"probing multiplier {probing_multiplier} < 1.0"
        )
    return FixedParameters(order, probing_multiplier, model_type, has_vocabulary, search_version)


def read_headers(path: str) -> BinaryHeaders:
    """Read + validate the sanity/fixed/counts headers of a binary model."""
    with open(path, "rb") as f:
        head = f.read(SANITY_SIZE + FIXED_SIZE)
        if len(head) < SANITY_SIZE + FIXED_SIZE:
            raise NotBinaryFormat("file smaller than headers")
        check_sanity(head)
        fixed = parse_fixed(head[SANITY_SIZE:])
        raw_counts = f.read(8 * fixed.order)
        if len(raw_counts) < 8 * fixed.order:
            raise BinaryFormatError("truncated counts header")
        counts = list(struct.unpack(f"<{fixed.order}Q", raw_counts))
        file_size = os.fstat(f.fileno()).st_size
    # non-empty / positive / plausible validation (counts.rs:17-26): a corrupt
    # counts header would silently misalign every payload offset binary.py
    # computes, so reject zero counts and counts the file cannot possibly hold
    # (each stored n-gram costs >= 1 byte in any of the supported layouts)
    if not counts:
        raise BinaryFormatError("empty counts header")
    if any(c <= 0 for c in counts):
        raise BinaryFormatError(f"non-positive n-gram count in header: {counts}")
    if sum(counts) > file_size * 8:
        raise BinaryFormatError(
            f"counts header implausible: {sum(counts)} n-grams in a "
            f"{file_size}-byte file"
        )
    return BinaryHeaders(fixed=fixed, counts=counts)


def is_binary_format(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            check_sanity(f.read(SANITY_SIZE))
        return True
    except (NotBinaryFormat, OSError):
        return False
    except BinaryFormatError:
        raise
