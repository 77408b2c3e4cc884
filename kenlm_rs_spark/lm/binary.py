"""KenLM binary model payload loaders (trie + probing) → canonical NGramModel.

Layouts decoded (all little-endian, validated against the reference fixtures):

TRIE (model_type 2, search_version 1, DontQuantize + DontBhiksha):
  [header][sorted vocab: u64 count, u64 hashes][search][vocab strings]
  - vocab region size = 8 + 8*counts[0]
    (SortedVocabulary::Size, /root/reference/src/cxx/lm/vocab.cc:84-87)
  - unigram: (counts[0]+2) x {prob f32, backoff f32, next u64}
    (/root/reference/src/cxx/lm/trie.hh:22-26,52-55)
  - middle order i (2..N-1): bit-packed entries of
    word(RequiredBits(counts[0])) + prob(31, NonPositiveFloat31) +
    backoff(32) + next(RequiredBits(counts[i]));
    size = ((1+counts[i-1])*total_bits+7)/8 + 8
    (/root/reference/src/cxx/lm/trie.cc:39-46,60-72; bit readers
    /root/reference/src/cxx/util/bit_packing.hh:54-154)
  - longest: word + prob(31); child ranges give independent_left
    (/root/reference/src/cxx/lm/search_trie.hh:70-89)

PROBING (model_type 0, search_version 0):
  [header][probing vocab: 8-byte header + 12-byte {u64 hash,u32 id} buckets]
  [unigram (counts[0]+1) x ProbBackoff][middle tables 16-byte
  {u64 key, f32 prob, f32 backoff}][longest 12-byte {u64 key, f32 prob}]
  buckets = max(entries+1, multiplier*entries)
  (/root/reference/src/cxx/util/probing_hash_table.hh:108-111);
  'extends left' stored in the prob sign bit
  (/root/reference/src/cxx/lm/value.hh:16-41).

The decoded tables are re-keyed to the CombineWordHash chain scheme so one
canonical scorer serves every source format.
"""

from __future__ import annotations

import numpy as np

from .headers import (
    ARRAY_TRIE,
    PROBING,
    QUANT_ARRAY_TRIE,
    QUANT_TRIE,
    TRIE,
    BinaryFormatError,
    BinaryHeaders,
    read_headers,
)
from .model import NGramModel, _OrderTable
from .murmur import combine_word_hash_np


class ModelHasNoVocab(BinaryFormatError):
    """store_vocab requested but the binary has no vocabulary strings
    (/root/reference/src/model/mod.rs:372-379 semantics)."""


def required_bits(max_value: int) -> int:
    if max_value == 0:
        return 0
    bits = 1
    while max_value >> 1:
        max_value >>= 1
        bits += 1
    return bits


def _read_bits(buf: np.ndarray, bit_offsets: np.ndarray, length: int) -> np.ndarray:
    """Vectorized ReadInt57/ReadFloat32-style unaligned bit reads: gather the
    u64 at byte (off>>3), shift by (off&7), mask to ``length`` bits."""
    off = bit_offsets.astype(np.uint64)
    byte_off = (off >> np.uint64(3)).astype(np.int64)
    # gather 8 bytes per offset -> u64 little-endian
    idx = byte_off[:, None] + np.arange(8, dtype=np.int64)[None, :]
    raw = buf[idx].astype(np.uint64)
    shifts = (np.arange(8, dtype=np.uint64) * np.uint64(8))[None, :]
    u64 = np.bitwise_or.reduce(raw << shifts, axis=1)
    shift = (off & np.uint64(7)).astype(np.uint64)
    mask = np.uint64((1 << length) - 1) if length < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    return (u64 >> shift) & mask


def _bits_to_f32(bits: np.ndarray) -> np.ndarray:
    return bits.astype(np.uint32).view(np.float32)


def _nonpositive_f31(bits: np.ndarray) -> np.ndarray:
    """ReadNonPositiveFloat31: set the sign bit, reinterpret as f32."""
    return (bits.astype(np.uint32) | np.uint32(0x80000000)).view(np.float32)


def _read_vocab_strings(data: bytes, offset: int, expected: int) -> list[str]:
    """NUL-delimited word list at the file tail; '<unk>' must come first
    (/root/reference/src/cxx/lm/vocab.cc:35-53)."""
    if data[offset : offset + 6] != b"<unk>\x00":
        raise BinaryFormatError("vocabulary words are in the wrong place")
    body = data[offset:]
    if body.endswith(b"\x00"):
        body = body[:-1]
    parts = body.split(b"\x00")
    words = [p.decode("utf-8", errors="replace") for p in parts]
    if len(words) != expected:
        raise BinaryFormatError(
            f"binary file has the wrong number of words: {len(words)} != {expected}"
        )
    return words


def load_binary(path: str, store_vocab: bool = True) -> NGramModel:
    headers = read_headers(path)
    fixed = headers.fixed
    if store_vocab and not fixed.has_vocabulary:
        raise ModelHasNoVocab(
            "the decoder requested all the vocabulary strings, "
            "but this binary file does not have them"
        )
    with open(path, "rb") as f:
        data = f.read()
    if fixed.model_type in (TRIE, QUANT_TRIE, ARRAY_TRIE, QUANT_ARRAY_TRIE):
        if fixed.search_version != 1:
            raise BinaryFormatError(f"trie search version {fixed.search_version} != 1")
        return _load_trie(
            data, headers, store_vocab,
            quantized=fixed.model_type in (QUANT_TRIE, QUANT_ARRAY_TRIE),
            bhiksha=fixed.model_type in (ARRAY_TRIE, QUANT_ARRAY_TRIE),
        )
    if fixed.model_type == PROBING:
        if fixed.search_version != 0:
            raise BinaryFormatError(f"probing search version {fixed.search_version} != 0")
        return _load_probing(data, headers, store_vocab)
    raise BinaryFormatError(
        f"model type {fixed.model_type} not implemented (rest-probing is out of "
        "scope; rebuild as TRIE or PROBING)"
    )


def _chop_bits_read(max_offset: int, max_next: int, config_bits: int) -> int:
    """bhiksha.cc ChopBits — recomputed at load time from the stored config
    byte, exactly like ArrayBhiksha's constructor."""
    req = required_bits(max_next)
    best_chop, lowest = 0, None
    for chop in range(0, min(req, config_bits) + 1):
        change = (max_next >> (req - chop)) * 64 - max_offset * chop
        if lowest is None or change < lowest:
            lowest, best_chop = change, chop
    return best_chop


def _load_trie(
    data: bytes,
    headers: BinaryHeaders,
    store_vocab: bool,
    quantized: bool = False,
    bhiksha: bool = False,
) -> NGramModel:
    counts = headers.counts
    n_orders = len(counts)
    hs = headers.header_size
    buf = np.frombuffer(data, dtype=np.uint8)

    # ---- sorted vocab: u64 count then hashes (hash order; id = rank + 1)
    n_hashes = int(np.frombuffer(data, dtype="<u8", count=1, offset=hs)[0])
    vocab_hashes = np.frombuffer(data, dtype="<u8", count=n_hashes, offset=hs + 8).copy()
    bound = n_hashes + 1
    vocab_size = 8 + 8 * counts[0]
    pos = hs + vocab_size

    # ---- quantization tables (quantize.cc: 8-byte header {version=2,
    # prob_bits, backoff_bits} + per-middle prob/backoff bins + longest bins)
    quant_tables = None
    long_bins = None
    pb = bb = 0
    if quantized:
        version, pb, bb = data[pos], data[pos + 1], data[pos + 2]
        if version != 2:
            raise BinaryFormatError(
                f"quantization version {version} != 2 (quantize.cc)"
            )
        qpos = pos + 8
        quant_tables = []
        for _ in range(2, n_orders):
            prob_bins = np.frombuffer(data, dtype="<f4", count=1 << pb, offset=qpos)
            qpos += 4 * (1 << pb)
            backoff_bins = np.frombuffer(data, dtype="<f4", count=1 << bb, offset=qpos)
            qpos += 4 * (1 << bb)
            quant_tables.append((prob_bins, backoff_bins))
        long_bins = np.frombuffer(data, dtype="<f4", count=1 << pb, offset=qpos)
        qpos += 4 * (1 << pb)
        pos = qpos

    # ---- unigram array
    uni_count = counts[0] + 2
    uni = np.frombuffer(
        data, dtype=np.dtype([("prob", "<f4"), ("backoff", "<f4"), ("next", "<u8")]),
        count=uni_count, offset=pos,
    )
    pos += uni_count * 16
    uni_prob = uni["prob"][:bound].copy()
    uni_backoff = uni["backoff"][:bound].copy()
    uni_next = uni["next"][: counts[0] + 1].astype(np.int64)
    uni_indep = uni_next[:bound] == uni_next[1 : bound + 1]

    word_bits = required_bits(counts[0])

    # ---- middles: decode bit-packed entries + child ranges
    per_order_word = []  # decoded context-word field per entry
    per_order_prob = []
    per_order_backoff = []
    per_order_child_begin = []
    per_order_child_end = []
    for order in range(2, n_orders):
        entries = counts[order - 1]
        quant_width = (pb + bb) if quantized else 63
        if bhiksha:
            # ArrayBhiksha region precedes the bit array (bhiksha.cc):
            # {version, config bits} at the RAW region base, offsets array at
            # AlignTo8(base)+8 (8-aligned in absolute file offset — header is
            # ALIGN8'd so file offset mod 8 == mmap address mod 8), total
            # region size fixed at 8*(1+count)+7 (+7 absorbs alignment skid)
            bver, config_bits = data[pos], data[pos + 1]
            if bver != 0:
                raise BinaryFormatError(f"bhiksha version {bver} != 0")
            chop = _chop_bits_read(entries + 1, counts[order], config_bits)
            next_bits = required_bits(counts[order]) - chop
            array_count = (counts[order] >> next_bits) + 1
            offsets = np.frombuffer(
                data, dtype="<u8", count=array_count,
                offset=pos + (-pos) % 8 + 8,
            ).astype(np.int64)
            pos += 8 * (1 + array_count) + 7
        else:
            next_bits = required_bits(counts[order])
            offsets = None
        total_bits = word_bits + quant_width + next_bits
        size = ((1 + entries) * total_bits + 7) // 8 + 8
        region = buf[pos : pos + size]
        base = np.arange(entries, dtype=np.uint64) * np.uint64(total_bits)
        word = _read_bits(region, base, word_bits).astype(np.int64)
        if quantized:
            q_b = _read_bits(region, base + np.uint64(word_bits), bb).astype(np.int64)
            q_p = _read_bits(region, base + np.uint64(word_bits + bb), pb).astype(np.int64)
            prob_bins, backoff_bins = quant_tables[order - 2]
            prob = prob_bins[q_p].copy()
            backoff = backoff_bins[q_b].copy()
        else:
            prob = _nonpositive_f31(_read_bits(region, base + np.uint64(word_bits), 32) & np.uint64(0x7FFFFFFF))
            backoff = _bits_to_f32(_read_bits(region, base + np.uint64(word_bits + 31), 32))
        base_next = np.arange(entries + 1, dtype=np.uint64) * np.uint64(total_bits) + np.uint64(word_bits + quant_width)
        nexts = _read_bits(region, base_next, next_bits).astype(np.int64)
        if bhiksha:
            # full pointer = (offset-block << inline_bits) | inline value,
            # block = last offsets entry <= entry index (bhiksha.hh ReadNext)
            idxs = np.arange(entries + 1, dtype=np.int64)
            blocks = np.searchsorted(offsets, idxs, side="right") - 1
            nexts = (blocks << np.int64(next_bits)) | nexts
        per_order_word.append(word)
        per_order_prob.append(prob)
        per_order_backoff.append(backoff)
        per_order_child_begin.append(nexts[:-1])
        per_order_child_end.append(nexts[1:])
        pos += size

    # ---- longest
    entries = counts[-1]
    total_bits = word_bits + (pb if quantized else 31)
    size = ((1 + entries) * total_bits + 7) // 8 + 8
    region = buf[pos : pos + size]
    base = np.arange(entries, dtype=np.uint64) * np.uint64(total_bits)
    long_word = _read_bits(region, base, word_bits).astype(np.int64)
    if quantized:
        q_p = _read_bits(region, base + np.uint64(word_bits), pb).astype(np.int64)
        long_prob = long_bins[q_p].copy()
    else:
        long_prob = _nonpositive_f31(_read_bits(region, base + np.uint64(word_bits), 32) & np.uint64(0x7FFFFFFF))
    pos += size

    # ---- vocab strings (enumeration order == id order for the trie)
    words = None
    if store_vocab:
        words = _read_vocab_strings(data, pos, bound)

    # ---- convert reverse-trie ranges to CombineWordHash chain keys.
    # Children of unigram w (ids) are the bigram entries (v, w); recursively,
    # children of a middle entry are one-order-longer grams sharing its suffix.
    # parent_key[j] for level k = chain key of the k-gram at entry j.
    middles = []
    # level for order 2: parents are unigrams
    parent_keys_prev = None
    for li, order in enumerate(range(2, n_orders)):
        n_entries = len(per_order_word[li])
        parent_of = np.zeros(n_entries, dtype=np.int64)
        if li == 0:
            begins, ends = uni_next[:-1], uni_next[1:]
            parent_node = np.arange(counts[0], dtype=np.uint64)
        else:
            begins, ends = per_order_child_begin[li - 1], per_order_child_end[li - 1]
            parent_node = parent_keys_prev
        # scatter parent index over child ranges
        counts_per_parent = (ends - begins).astype(np.int64)
        parent_of = np.repeat(np.arange(len(counts_per_parent)), counts_per_parent)
        if len(parent_of) != n_entries:
            raise BinaryFormatError(
                f"trie order {order}: child ranges cover {len(parent_of)} != {n_entries}"
            )
        keys = combine_word_hash_np(
            parent_node[parent_of], per_order_word[li].astype(np.uint64)
        )
        indep = per_order_child_begin[li] == per_order_child_end[li]
        middles.append(
            _OrderTable(keys, per_order_prob[li], per_order_backoff[li], indep)
        )
        parent_keys_prev = keys

    # longest level
    if n_orders == 2:
        begins, ends = uni_next[:-1], uni_next[1:]
        parent_node = np.arange(counts[0], dtype=np.uint64)
    else:
        begins, ends = per_order_child_begin[-1], per_order_child_end[-1]
        parent_node = parent_keys_prev
    counts_per_parent = (ends - begins).astype(np.int64)
    parent_of = np.repeat(np.arange(len(counts_per_parent)), counts_per_parent)
    if len(parent_of) != len(long_word):
        raise BinaryFormatError("trie longest: child ranges do not cover entries")
    long_keys = combine_word_hash_np(parent_node[parent_of], long_word.astype(np.uint64))
    longest_tab = _OrderTable(long_keys, long_prob)

    order_ids = np.arange(1, bound, dtype=np.uint32)
    return NGramModel(
        order=n_orders,
        counts=counts,
        uni_prob=uni_prob,
        uni_backoff=uni_backoff,
        uni_indep=uni_indep,
        middles=middles,
        longest=longest_tab,
        words=words,
        vocab_hashes=vocab_hashes,
        vocab_hash_ids=order_ids,
        fixed_parameters=headers.fixed,
    )


def _probing_buckets(entries: int, multiplier: float) -> int:
    return max(entries + 1, int(np.float32(multiplier) * np.float32(entries)))


def _load_probing(data: bytes, headers: BinaryHeaders, store_vocab: bool) -> NGramModel:
    counts = headers.counts
    n_orders = len(counts)
    fixed = headers.fixed
    hs = headers.header_size

    # ---- probing vocab: {u32 version, u32 bound} + 12-byte buckets
    version, bound = np.frombuffer(data, dtype="<u4", count=2, offset=hs)
    if version != 0:
        raise BinaryFormatError(f"probing vocabulary version {version} != 0")
    bound = int(bound)
    v_buckets = _probing_buckets(counts[0], fixed.probing_multiplier)
    vt = np.frombuffer(
        data,
        dtype=np.dtype({"names": ["key", "value"], "formats": ["<u8", "<u4"], "itemsize": 12}),
        count=v_buckets,
        offset=hs + 8,
    )
    used = vt["key"] != 0
    vocab_hashes_raw = vt["key"][used].copy()
    vocab_ids_raw = vt["value"][used].astype(np.uint32)
    hash_order = np.argsort(vocab_hashes_raw, kind="stable")
    vocab_hashes = vocab_hashes_raw[hash_order]
    vocab_hash_ids = vocab_ids_raw[hash_order]
    vocab_size = 8 + v_buckets * 12
    pos = hs + vocab_size

    # ---- unigram weights, prob sign bit = NOT extends-left (value.hh:16-41)
    uni = np.frombuffer(
        data, dtype=np.dtype([("prob", "<f4"), ("backoff", "<f4")]),
        count=counts[0] + 1, offset=pos,
    )
    pos += (counts[0] + 1) * 8
    raw_prob = uni["prob"][:bound]
    prob_bits = raw_prob.view(np.uint32)
    uni_indep = (prob_bits & np.uint32(0x80000000)) != 0
    uni_prob = (prob_bits | np.uint32(0x80000000)).view(np.float32).copy()
    uni_backoff = uni["backoff"][:bound].copy()

    # ---- middles
    middles = []
    for order in range(2, n_orders):
        entries = counts[order - 1]
        buckets = _probing_buckets(entries, fixed.probing_multiplier)
        mt = np.frombuffer(
            data,
            dtype=np.dtype([("key", "<u8"), ("prob", "<f4"), ("backoff", "<f4")]),
            count=buckets,
            offset=pos,
        )
        pos += buckets * 16
        used = mt["key"] != 0
        keys = mt["key"][used].copy()
        pb = mt["prob"][used].view(np.uint32)
        indep = (pb & np.uint32(0x80000000)) != 0
        prob = (pb | np.uint32(0x80000000)).view(np.float32)
        middles.append(_OrderTable(keys, prob, mt["backoff"][used], indep))

    # ---- longest (prob only; sign always on)
    entries = counts[-1]
    buckets = _probing_buckets(entries, fixed.probing_multiplier)
    lt = np.frombuffer(
        data,
        dtype=np.dtype({"names": ["key", "prob"], "formats": ["<u8", "<f4"], "itemsize": 12}),
        count=buckets,
        offset=pos,
    )
    pos += buckets * 12
    used = lt["key"] != 0
    longest_tab = _OrderTable(lt["key"][used].copy(), lt["prob"][used].copy())

    # ---- vocab strings (insertion order == id order for probing)
    words = None
    if store_vocab:
        if not fixed.has_vocabulary:
            raise ModelHasNoVocab("binary has no vocabulary strings")
        words = _read_vocab_strings(data, pos, bound)

    return NGramModel(
        order=n_orders,
        counts=counts,
        uni_prob=uni_prob,
        uni_backoff=uni_backoff,
        uni_indep=uni_indep,
        middles=middles,
        longest=longest_tab,
        words=words,
        vocab_hashes=vocab_hashes,
        vocab_hash_ids=vocab_hash_ids,
        fixed_parameters=headers.fixed,
    )
