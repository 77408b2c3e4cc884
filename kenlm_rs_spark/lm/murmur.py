"""MurmurHash64A — the vocabulary hash used by KenLM.

Semantics from the reference: /root/reference/src/cxx/util/murmur_hash.cc:26-79
(MurmurHash2 64-bit by Austin Appleby, public domain). KenLM hashes vocabulary
words with seed 0 and always uses the 64A variant so binary files are portable
(/root/reference/src/cxx/lm/vocab.cc:22-26).

Implemented from the published algorithm in pure Python (uint64 wraparound via
masking). Used for vocab lookup parity with binary models and as the id-mapping
fallback when a model ships no vocabulary strings.
"""

from __future__ import annotations

import numpy as np

_M = 0xC6A4A7935BD1E995
_MASK = 0xFFFFFFFFFFFFFFFF
_R = 47


def murmur_hash64a(data: bytes, seed: int = 0) -> int:
    """64-bit MurmurHash2 (variant A) of ``data`` with ``seed``."""
    n = len(data)
    h = (seed ^ ((n * _M) & _MASK)) & _MASK
    nblocks = n // 8
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * _M) & _MASK
        k ^= k >> _R
        k = (k * _M) & _MASK
        h ^= k
        h = (h * _M) & _MASK
    tail = data[nblocks * 8 :]
    if tail:
        t = int.from_bytes(tail, "little")
        h ^= t
        h = (h * _M) & _MASK
    h ^= h >> _R
    h = (h * _M) & _MASK
    h ^= h >> _R
    return h


def hash_for_vocab(word: str) -> int:
    """KenLM's HashForVocab: MurmurHash64A(word_bytes, seed=0)."""
    return murmur_hash64a(word.encode("utf-8"), 0)


# n-gram chain hash for hashed lookup tables
# (/root/reference/src/cxx/lm/search_hashed.hh:25-28):
#   CombineWordHash(cur, next) = (cur * A) ^ ((1 + next) * B)
_A = 8978948897894561157
_B = 17894857484156487943


def combine_word_hash(current: int, next_word: int) -> int:
    return ((current * _A) & _MASK) ^ (((1 + next_word) * _B) & _MASK)


def combine_word_hash_np(current: np.ndarray, next_word: np.ndarray) -> np.ndarray:
    """Vectorized CombineWordHash over uint64 arrays (wrapping arithmetic)."""
    cur = current.astype(np.uint64, copy=False)
    nxt = next_word.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        return (cur * np.uint64(_A)) ^ ((np.uint64(1) + nxt) * np.uint64(_B))


def ngram_chain_hash(word_ids) -> int:
    """Chain hash of an n-gram given ids in TEXT order (w1 .. wn).

    The chain starts at the newest word wn and folds context words
    most-recent-first, mirroring the walk order of the scorer
    (/root/reference/src/cxx/lm/model.cc:317-330).
    """
    ids = list(word_ids)
    node = int(ids[-1])
    for w in reversed(ids[:-1]):
        node = combine_word_hash(node, int(w))
    return node
