"""KenLM-compatible binary model WRITERS (S7 interop half, VERDICT r01
items 4/5): probing (model_type 0) and trie (model_type 2/3/4/5 with optional
SeparatelyQuantize and ArrayBhiksha), from parsed ARPA sections.

Layout laws implemented (and where the reference defines them):
- header: Sanity + FixedWidthParameters + counts, ALIGN8
  (binary_format.cc:52-93; kenlm_rs_spark/lm/headers.py mirrors the parse)
- probing vocab: 8-byte {u32 version=0, u32 bound} + DivMod linear-probing
  table of 12-byte {u64 murmur hash, u32 id}; <unk> never inserted, ids in
  ARPA unigram order starting at 1 (vocab.cc ProbingVocabulary::Insert)
- probing search: (counts[0]+1) x ProbBackoff unigrams; per order DivMod
  tables of {u64 chain-hash key, f32 prob, f32 backoff} (16B) / {u64, f32}
  (12B packed) for the longest; 'extends left' in the prob sign bit
  (value.hh:16-41), backoff +-0.0 extension convention (blank.hh:22-36)
- trie vocab: u64 count + sorted murmur hashes, id = rank + 1
  (vocab.cc:84-117 SortedVocabulary)
- trie search: [quant tables][unigram (counts[0]+2) x {f32,f32,u64}]
  [middles: optional bhiksha offsets + bit-packed
   word/(prob31+backoff32 | q_backoff+q_prob)/next][longest]
  (trie.cc:39-120, quantize.cc MakeBins equal-frequency bins with reserved
  backoff slots 0=-0.0/1=+0.0, bhiksha.cc ChopBits/offset array)

The writers exist (a) for interop — text-level ARPA was the only export
before — and (b) to GENERATE fixtures for the quantized/bhiksha READERS,
since the reference repo ships no quantized binaries.
"""

from __future__ import annotations

import struct

import numpy as np

from .arpa import ArpaSections
from .headers import (
    ARRAY_TRIE,
    FIXED_SIZE,
    PROBING,
    QUANT_ARRAY_TRIE,
    QUANT_TRIE,
    SANITY_SIZE,
    TRIE,
    align8,
    reference_sanity,
    total_header_size,
)
from .murmur import combine_word_hash, hash_for_vocab

UNK, BOS, EOS = "<unk>", "<s>", "</s>"


# --------------------------------------------------------------------- shared

def _header_bytes(order, probing_multiplier, model_type, has_vocab, search_version, counts):
    fixed = struct.pack(
        "<B3xfIB3xI",
        order, float(probing_multiplier), model_type, 1 if has_vocab else 0,
        search_version,
    )
    assert len(fixed) == FIXED_SIZE
    body = reference_sanity() + fixed + struct.pack(f"<{order}Q", *counts)
    return body + b"\x00" * (total_header_size(order) - len(body))


def _per_order(sections: ArpaSections):
    """[(gram tuple, prob f32 log10, backoff f32 log10-or-None)] per order."""
    orders = []
    for recs in sections.backoffs:
        orders.append([(tuple(r.ngram), r.log_prob, r.backoff) for r in recs])
    orders.append([(tuple(r.ngram), r.log_prob, None) for r in sections.no_backoff])
    return orders


def _extends_left_sets(orders):
    """Per order: set of grams that have a stored left extension (some
    (v + gram) exists one order up) — drives the sign-bit / +-0.0 flags."""
    ext = [set() for _ in orders]
    for n in range(1, len(orders)):
        lower = ext[n - 1]
        for g, _, _ in orders[n]:
            lower.add(g[1:])
    return ext


def _flagged_backoff(backoff, extends_left: bool) -> np.float32:
    """blank.hh convention: zero backoff carries the extension flag in its
    sign (-0.0 = cannot extend left, +0.0 = can)."""
    b = np.float32(backoff if backoff is not None else 0.0)
    if b == np.float32(0.0):
        return np.float32(0.0) if extends_left else np.float32(-0.0)
    return b


# -------------------------------------------------------------------- probing

def _probing_buckets(entries: int, multiplier: float) -> int:
    return max(entries + 1, int(np.float32(multiplier) * np.float32(entries)))


def _probing_insert(keys, payloads, buckets: int, itemsize: int, pack_row) -> bytearray:
    """DivMod linear-probing insertion (probing_hash_table.hh:29-50): ideal
    slot = key % buckets, advance by 1 wrapping; key 0 marks empty."""
    table = bytearray(buckets * itemsize)
    occupied = np.zeros(buckets, dtype=bool)
    for key, payload in zip(keys, payloads):
        if key == 0:
            raise ValueError("probing key 0 collides with the empty marker")
        i = key % buckets
        while occupied[i]:
            i = (i + 1) % buckets
        occupied[i] = True
        table[i * itemsize : (i + 1) * itemsize] = pack_row(key, payload)
    return table


def _check_suffix_closed(orders) -> None:
    """SRI-pruned ARPAs have suffix holes; kenlm hallucinates blank entries
    at load (search_hashed.cc:57-136). The writers require a closed model —
    without blanks a longer match would be unreachable through the chain."""
    for n in range(1, len(orders)):
        lower = {g for g, _, _ in orders[n - 1]}
        for g, _, _ in orders[n]:
            if g[1:] not in lower:
                raise ValueError(
                    f"suffix hole: {g[1:]} missing at order {n} — SRI-pruned "
                    "models are not writable (blanks are a load-time feature)"
                )


def write_probing(
    sections: ArpaSections, path: str, probing_multiplier: float = 1.5
) -> None:
    """ARPA sections -> PROBING (model_type 0, search_version 0) binary."""
    orders = _per_order(sections)
    order = len(orders)
    counts = [len(o) for o in orders]
    ext = _extends_left_sets(orders)
    _check_suffix_closed(orders)

    # vocab ids: ARPA unigram order, <unk> -> 0, others 1.. (vocab.cc Insert)
    word_id = {}
    words = [UNK]
    nxt = 1
    saw_unk = False
    for g, _, _ in orders[0]:
        w = g[0]
        if w == UNK:
            saw_unk = True
            word_id[w] = 0
            continue
        word_id[w] = nxt
        words.append(w)
        nxt += 1
    if not saw_unk:
        raise ValueError("ARPA without <unk> not supported by the writer")
    bound = nxt

    out = bytearray()
    out += _header_bytes(order, probing_multiplier, PROBING, True, 0, counts)

    # ---- vocab table
    v_buckets = _probing_buckets(counts[0], probing_multiplier)
    out += struct.pack("<II", 0, bound)
    vkeys = [hash_for_vocab(w) for w in words[1:]]
    vids = list(range(1, bound))
    out += _probing_insert(
        vkeys, vids, v_buckets, 12,
        lambda k, v: struct.pack("<QI", k, v),
    )

    # ---- unigram weights (ids 0..counts[0]-1; +1 spare slot)
    uni = np.zeros(counts[0] + 1, dtype=np.dtype([("prob", "<f4"), ("backoff", "<f4")]))
    for g, p, b in orders[0]:
        i = word_id[g[0]]
        prob = np.float32(p)
        bits = prob.view(np.uint32)
        if g in ext[0]:
            bits = np.uint32(bits & np.uint32(0x7FFFFFFF))  # extends: sign off
        uni["prob"][i] = bits.view(np.float32)
        uni["backoff"][i] = _flagged_backoff(b, g in ext[0])
    out += uni.tobytes()

    # ---- chain-hash keys: combine backwards from the LAST word
    def chain_key(g):
        key = np.uint64(word_id[g[-1]])
        for w in reversed(g[:-1]):
            key = combine_word_hash(int(key), word_id[w])
        return int(key)

    for n in range(2, order):
        entries = orders[n - 1]
        buckets = _probing_buckets(len(entries), probing_multiplier)

        def pack_mid(k, payload):
            p, b, has_ext = payload
            bits = np.float32(p).view(np.uint32)
            if has_ext:
                bits = np.uint32(bits & np.uint32(0x7FFFFFFF))
            return struct.pack("<Qff", k, float(bits.view(np.float32)),
                               float(_flagged_backoff(b, has_ext)))

        keys = [chain_key(g) for g, _, _ in entries]
        payloads = [(p, b, g in ext[n - 1]) for g, p, b in entries]
        out += _probing_insert(keys, payloads, buckets, 16, pack_mid)

    # ---- longest (12-byte packed, prob sign always on)
    entries = orders[-1]
    buckets = _probing_buckets(len(entries), probing_multiplier)
    out += _probing_insert(
        [chain_key(g) for g, _, _ in entries],
        [p for _, p, _ in entries],
        buckets, 12,
        lambda k, p: struct.pack("<Qf", k, float(np.float32(p))),
    )

    # ---- vocab strings, id order, NUL-terminated each
    out += b"".join(w.encode("utf-8") + b"\x00" for w in words)
    with open(path, "wb") as f:
        f.write(bytes(out))


# ----------------------------------------------------------------------- trie

def required_bits(max_value: int) -> int:
    if max_value == 0:
        return 0
    bits = 1
    while max_value >> 1:
        max_value >>= 1
        bits += 1
    return bits


class _BitWriter:
    """Little-endian unaligned bit packing (util/bit_packing.hh WriteInt57)."""

    def __init__(self, size_bytes: int):
        self.buf = bytearray(size_bytes)

    def write(self, bit_offset: int, bits: int, value: int) -> None:
        byte = bit_offset >> 3
        shift = bit_offset & 7
        cur = int.from_bytes(self.buf[byte : byte + 8], "little")
        cur |= (value & ((1 << bits) - 1)) << shift
        self.buf[byte : byte + 8] = cur.to_bytes(8, "little")


def _f32_bits(x) -> int:
    return int(np.float32(x).view(np.uint32))


def _make_bins(values: list[float], n_bins: int) -> list[float]:
    """quantize.cc MakeBins: sort, equal-frequency spans, double-accumulated
    mean per span cast to f32; empty span inherits the previous center
    (-inf for the first)."""
    vals = sorted(np.float32(v) for v in values)
    centers = []
    start = 0
    for i in range(n_bins):
        finish = (len(vals) * (i + 1)) // n_bins
        if finish == start:
            centers.append(centers[-1] if centers else np.float32(-np.inf))
        else:
            acc = 0.0
            for v in vals[start:finish]:
                acc += float(v)
            centers.append(np.float32(acc / np.float32(finish - start)))
        start = finish
    return centers


def _encode_bins(centers, value, reserved: int) -> int:
    """quantize.hh Bins::Encode: nearest center at or above `reserved`."""
    v = np.float32(value)
    arr = centers[reserved:]
    import bisect

    above = bisect.bisect_left(arr, v) + reserved
    if above == reserved:
        return reserved
    if above == len(centers):
        return len(centers) - 1
    below_d = float(v) - float(centers[above - 1])
    above_d = float(centers[above]) - float(v)
    return above - (1 if below_d < above_d else 0)


def _chop_bits(max_offset: int, max_next: int, bhiksha_max_bits: int) -> int:
    """bhiksha.cc ChopBits: argmin of table cost minus inline savings."""
    required = required_bits(max_next)
    best_chop, lowest = 0, None
    for chop in range(0, min(required, bhiksha_max_bits) + 1):
        change = (max_next >> (required - chop)) * 64 - max_offset * chop
        if lowest is None or change < lowest:
            lowest, best_chop = change, chop
    return best_chop


def write_trie(
    sections: ArpaSections,
    path: str,
    quant_bits: tuple[int, int] | None = None,
    bhiksha_bits: int | None = None,
    probing_multiplier: float = 1.5,
) -> None:
    """ARPA sections -> TRIE binary (search_version 1). ``quant_bits`` =
    (prob_bits, backoff_bits) turns on SeparatelyQuantize (model_type +3 per
    kQuantAdd); ``bhiksha_bits`` turns on ArrayBhiksha next-pointer
    compression (model_type +2 per kArrayAdd)."""
    orders = _per_order(sections)
    order = len(orders)
    if order < 2:
        raise ValueError("trie writer needs order >= 2")
    counts = [len(o) for o in orders]
    ext = _extends_left_sets(orders)
    _check_suffix_closed(orders)

    model_type = TRIE
    if quant_bits:
        model_type += QUANT_TRIE - TRIE
    if bhiksha_bits is not None:
        model_type += ARRAY_TRIE - TRIE
    assert model_type in (TRIE, QUANT_TRIE, ARRAY_TRIE, QUANT_ARRAY_TRIE)

    # ---- sorted vocab: hash-ranked ids, <unk>=0 (vocab.cc SortedVocabulary)
    vocab_words = [g[0] for g, _, _ in orders[0]]
    if UNK not in vocab_words:
        raise ValueError("ARPA without <unk> not supported by the writer")
    hashed = sorted(
        (hash_for_vocab(w), w) for w in vocab_words if w != UNK
    )
    word_id = {UNK: 0}
    for rank, (_, w) in enumerate(hashed):
        word_id[w] = rank + 1
    words = [UNK] + [w for _, w in hashed]
    bound = len(words)

    # ---- reverse-trie entry ordering: children of the (k-1) SUFFIX, sorted
    # by parent entry index then leftmost word id (search_trie.hh layout)
    # order 1 "entries" are unigram id slots 0..counts[0]-1
    entry_index: list[dict[tuple, int]] = [
        {(w,): word_id[w] for w in vocab_words}
    ]
    ordered: list[list[tuple]] = [None]  # per order k>=2: gram list in layout order
    for n in range(2, order + 1):
        prev_idx = entry_index[n - 2]
        grams = []
        for g, _, _ in orders[n - 1]:
            suffix = g[1:]
            if suffix not in prev_idx:
                raise ValueError(
                    f"trie writer: suffix {suffix} of {g} missing at order {n-1} "
                    "(SRI-style holes not supported; rebuild with a closed model)"
                )
            grams.append((prev_idx[suffix], word_id[g[0]], g))
        grams.sort()
        layout = [g for _, _, g in grams]
        ordered.append(layout)
        entry_index.append({g: i for i, g in enumerate(layout)})

    values = [dict() for _ in range(order)]
    for n in range(1, order + 1):
        for g, p, b in orders[n - 1]:
            values[n - 1][g] = (p, b)

    out = bytearray()
    out += _header_bytes(order, probing_multiplier, model_type, True, 1, counts)

    # ---- vocab region: u64 count + sorted hashes (8 + 8*counts[0] bytes,
    # consistent with the reader's vocab_size law)
    vregion = struct.pack("<Q", len(hashed)) + b"".join(
        struct.pack("<Q", h) for h, _ in hashed
    )
    vregion += b"\x00" * (8 + 8 * counts[0] - len(vregion))
    out += vregion

    # ---- quant tables (quantize.cc SetupMemory/Train)
    quant_tables = None
    if quant_bits:
        pb, bb = quant_bits
        if not (0 < pb <= 25 and 0 < bb <= 25):
            raise ValueError("quant bits must be in 1..25")
        quant_tables = []
        qbytes = bytearray()
        qbytes += struct.pack("<BBB5x", 2, pb, bb)  # version 2 + bit counts
        for n in range(2, order):
            probs = [values[n - 1][g][0] for g in ordered[n - 1]]
            backoffs = [
                values[n - 1][g][1]
                for g in ordered[n - 1]
                if values[n - 1][g][1] is not None
                and np.float32(values[n - 1][g][1]) != np.float32(0.0)
            ]
            prob_bins = _make_bins(probs, 1 << pb)
            backoff_bins = [np.float32(-0.0), np.float32(0.0)] + _make_bins(
                backoffs, (1 << bb) - 2
            )
            quant_tables.append((prob_bins, backoff_bins))
            qbytes += np.array(prob_bins, dtype="<f4").tobytes()
            qbytes += np.array(backoff_bins, dtype="<f4").tobytes()
        long_probs = [values[order - 1][g][0] for g in ordered[order - 1]]
        long_bins = _make_bins(long_probs, 1 << pb)
        quant_tables.append((long_bins, None))
        qbytes += np.array(long_bins, dtype="<f4").tobytes()
        out += qbytes

    word_bits = required_bits(counts[0])

    # next pointer of entry j at order n = index of its first child at n+1
    def child_ranges(n):
        """first-child index per order-n entry (+ final end)."""
        n_entries = counts[0] if n == 1 else counts[n - 1]
        child_parent = []
        nxt_level = ordered[n] if n < order else None
        firsts = np.full(n_entries + 1, -1, dtype=np.int64)
        if nxt_level is not None:
            idx = entry_index[n - 1]
            for ci, g in enumerate(nxt_level):
                p = idx[g[1:]] if n > 1 else word_id[g[1]]
                if firsts[p] == -1:
                    firsts[p] = ci
            firsts[n_entries] = len(nxt_level)
        # back-fill: entries with no children point at the next begin
        for i in range(n_entries - 1, -1, -1):
            if firsts[i] == -1:
                firsts[i] = firsts[i + 1]
        return firsts

    # ---- unigram array: (counts[0]+2) x {prob, backoff, next}
    uni = np.zeros(
        counts[0] + 2, dtype=np.dtype([("prob", "<f4"), ("backoff", "<f4"), ("next", "<u8")])
    )
    uni_next = child_ranges(1)
    for g, idx in ((g, word_id[g[0]]) for g, _, _ in orders[0]):
        p, b = values[0][g]
        uni["prob"][idx] = np.float32(p)
        uni["backoff"][idx] = _flagged_backoff(b, g in ext[0])
    uni["next"][: counts[0] + 1] = uni_next
    out += uni.tobytes()

    # ---- middles
    for n in range(2, order):
        entries = ordered[n - 1]
        max_next = counts[n]
        nexts = child_ranges(n)
        if quant_bits:
            quant_width = quant_bits[0] + quant_bits[1]
        else:
            quant_width = 63
        if bhiksha_bits is not None:
            chop = _chop_bits(len(entries) + 1, max_next, bhiksha_bits)
            inline_bits = required_bits(max_next) - chop
            array_count = (max_next >> inline_bits) + 1
            # offsets array: offsets[k] = first entry index with next>>inline >= k
            offsets = np.searchsorted(
                (nexts >> inline_bits) if inline_bits else nexts,
                np.arange(array_count, dtype=np.int64),
                side="left",
            ).astype(np.uint64)
            offsets[0] = 0
            # bhiksha.cc layout: {version, config_bits} at the RAW region
            # base (FinishedLoading writes to original_base_), offsets array
            # at AlignTo8(base) + 8 — 8-byte-aligned in absolute file offset
            # (the header is ALIGN8'd, binary_format.cc TotalHeaderSize, so
            # file offset mod 8 == mmap address mod 8). Region size is fixed
            # at 8*(1+count)+7 (Size()'s +7 absorbs the alignment skid); for
            # an already-aligned base this degenerates to [ver,cfg,6x pad,
            # offsets, 7 slack] but for order>=4 the second middle's base is
            # generally unaligned and the old layout misparsed (ADVICE r2).
            bh_base = len(out)
            bh = bytearray(8 * (1 + array_count) + 7)
            bh[0] = 0  # kArrayBhikshaVersion
            bh[1] = bhiksha_bits
            off_start = (-bh_base) % 8 + 8  # AlignTo8(base)+8, base-relative
            ob = offsets.astype("<u8").tobytes()
            bh[off_start : off_start + len(ob)] = ob
            out += bh
            next_field_bits = inline_bits
            next_mask = (1 << inline_bits) - 1
        else:
            next_field_bits = required_bits(max_next)
            next_mask = (1 << next_field_bits) - 1 if next_field_bits else 0
        total_bits = word_bits + quant_width + next_field_bits
        size = ((1 + len(entries)) * total_bits + 7) // 8 + 8
        bw = _BitWriter(size)
        for j, g in enumerate(entries):
            p, b = values[n - 1][g]
            base = j * total_bits
            bw.write(base, word_bits, word_id[g[0]])
            if quant_bits:
                pb_, bb_ = quant_bits
                prob_bins, backoff_bins = quant_tables[n - 2]
                flagged = _flagged_backoff(b, g in ext[n - 1])
                if flagged == np.float32(0.0):
                    q_b = 1 if _f32_bits(flagged) == 0 else 0  # +0.0 ext / -0.0 not
                else:
                    q_b = _encode_bins(backoff_bins, flagged, 2)
                q_p = _encode_bins(prob_bins, p, 0)
                bw.write(base + word_bits, bb_, q_b)
                bw.write(base + word_bits + bb_, pb_, q_p)
            else:
                bw.write(base + word_bits, 31, _f32_bits(p) & 0x7FFFFFFF)
                bw.write(
                    base + word_bits + 31, 32,
                    _f32_bits(_flagged_backoff(b, g in ext[n - 1])),
                )
            bw.write(base + word_bits + quant_width, next_field_bits,
                     int(nexts[j]) & next_mask)
        # final sentinel next at entry index len(entries)
        bw.write(
            len(entries) * total_bits + word_bits + quant_width,
            next_field_bits, int(nexts[len(entries)]) & next_mask,
        )
        out += bw.buf

    # ---- longest
    entries = ordered[order - 1]
    quant_width = quant_bits[0] if quant_bits else 31
    total_bits = word_bits + quant_width
    size = ((1 + len(entries)) * total_bits + 7) // 8 + 8
    bw = _BitWriter(size)
    for j, g in enumerate(entries):
        p, _ = values[order - 1][g]
        base = j * total_bits
        bw.write(base, word_bits, word_id[g[0]])
        if quant_bits:
            bw.write(base + word_bits, quant_bits[0],
                     _encode_bins(quant_tables[-1][0], p, 0))
        else:
            bw.write(base + word_bits, 31, _f32_bits(p) & 0x7FFFFFFF)
    out += bw.buf

    # ---- vocab strings (id order)
    out += b"".join(w.encode("utf-8") + b"\x00" for w in words)
    with open(path, "wb") as f:
        f.write(bytes(out))
