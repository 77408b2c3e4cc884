"""Vectorized batch scorer: KenLM-exact scoring over Arrow-sized batches.

Replaces the per-token FFI loop of the reference
(/root/reference/src/model/mod.rs:183-209 calling
/root/reference/src/cxx/lm/model.cc:169-368 twice per token) with a
position-parallel NumPy formulation: for each order k, the k-gram chain keys
of ALL token positions in the batch are built with one vectorized
CombineWordHash and probed with one np.searchsorted. This is mathematically
identical to the sequential state machine because of two invariants the
reference enforces at model-load time:

1. suffix closure: every (k-1)-suffix of a stored k-gram is stored (blanks are
   hallucinated for SRI-pruned models, search_hashed.cc:57-136), so the
   longest match at position t is prefix-closed;
2. context activation: if the k-gram ending at t exists, the (k-1)-gram ending
   at t-1 is its context and has an extension-marked backoff
   (search_hashed.cc:24-55), hence the state-length cap of the sequential walk
   (out_state.length) never excludes a lookup that would hit. The cap only
   skips guaranteed misses and -0.0 backoff charges, which are numeric no-ops.

f32 accumulation order is preserved: per-token backoff charging iterates
orders ascending (model.cc:172-175), per-document totals fold in token order
via np.add.at (unbuffered, index-ordered).
"""

from __future__ import annotations

import numpy as np

from .model import NGramModel
from .murmur import combine_word_hash_np

NEG_ZERO_BITS = np.uint32(0x80000000)

# exact token delimiters of the reference corpus reader
# (/root/reference/src/cxx/lm/builder/corpus_count.cc:241-246)
TOKEN_DELIMS = "\x00\t\n\r "
TOKEN_SPLIT_REGEX = "[\\x00\\t\\n\\r ]+"


def _has_ext(values: np.ndarray) -> np.ndarray:
    return values.view(np.uint32) != NEG_ZERO_BITS


def tokens_to_ids(model: NGramModel, tokens_flat: np.ndarray) -> np.ndarray:
    """Map a flat array of token strings to vocab ids (0 = <unk>).

    Hashing/lookup is done once per UNIQUE token in the batch, then gathered.
    """
    if len(tokens_flat) == 0:
        return np.zeros(0, dtype=np.int64)
    import pandas as pd

    # hash-based factorize beats sort-based np.unique ~5x on object arrays
    inv, uniq = pd.factorize(np.asarray(tokens_flat, dtype=object), sort=False)
    if model.word_to_id is not None:
        get = model.word_to_id.get
        uid = np.fromiter((get(w, 0) for w in uniq), dtype=np.int64, count=len(uniq))
    else:
        uid = np.fromiter(
            (model.get_word_idx(w) for w in uniq), dtype=np.int64, count=len(uniq)
        )
    return uid[inv]


def _lookup(table, keys: np.ndarray):
    """Vectorized sorted-array probe: returns (hit mask, row index clipped)."""
    n = len(table.keys)
    if n == 0:
        return np.zeros(len(keys), dtype=bool), np.zeros(len(keys), dtype=np.int64)
    idx = np.searchsorted(table.keys, keys)
    idxc = np.minimum(idx, n - 1)
    hit = table.keys[idxc] == keys
    return hit, idxc


def score_batch(
    model: NGramModel,
    ids_flat: np.ndarray,
    doc_offsets: np.ndarray,
    bos: bool = True,
    eos: bool = True,
):
    """Score a batch of documents given flat token ids + offsets.

    Returns dict with per-document float32 ``log10_prob``, int64 ``tokens``
    (scored tokens incl. </s> when eos), int64 ``oov``, float64 ``ppl``
    (Query semantics, ngram_query.hh:96-99), plus per-position arrays
    ``tok_score`` (f32), ``ext_len`` (state length after each scored token)
    for parity tests.
    """
    N = model.order
    ids_flat = np.asarray(ids_flat, dtype=np.int64)
    doc_offsets = np.asarray(doc_offsets, dtype=np.int64)
    n_docs = len(doc_offsets) - 1
    doc_lens = np.diff(doc_offsets)

    # ---- extended sequence: optional <s> prefix (context only), </s> suffix (scored)
    pre = 1 if bos else 0
    post = 1 if eos else 0
    ext_lens = doc_lens + pre + post
    ext_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(ext_lens, out=ext_off[1:])
    T = int(ext_off[-1])

    ids = np.zeros(T, dtype=np.int64)
    scored = np.ones(T, dtype=bool)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), ext_lens)
    pos_in_doc = np.arange(T, dtype=np.int64) - ext_off[doc_idx]

    # place original ids
    src_pos = ext_off[doc_idx] + pos_in_doc  # == arange(T)
    orig_mask = (pos_in_doc >= pre) & (pos_in_doc < pre + doc_lens[doc_idx])
    orig_src = doc_offsets[doc_idx] + (pos_in_doc - pre)
    ids[orig_mask] = ids_flat[orig_src[orig_mask]]
    if bos:
        starts = ext_off[:-1]
        ids[starts] = model.bos_id
        scored[starts] = False
    if eos:
        ends = ext_off[1:] - 1
        ids[ends] = model.eos_id

    is_doc_start = pos_in_doc == 0

    if T == 0:
        z = np.zeros(n_docs)
        return {
            "log10_prob": z.astype(np.float32),
            "tokens": np.zeros(n_docs, dtype=np.int64),
            "oov": np.zeros(n_docs, dtype=np.int64),
            "ppl": z,
            "tok_score": np.zeros(0, dtype=np.float32),
            "ext_len": np.zeros(0, dtype=np.int64),
            "scored_mask": scored,
        }

    # ---- order-1 lookups
    prob_matched = model.uni_prob[ids].astype(np.float32, copy=True)
    match_len = np.ones(T, dtype=np.int64)
    bo = np.zeros((N - 1, T), dtype=np.float32)
    bo[0] = model.uni_backoff[ids]
    ext_len = np.where(_has_ext(bo[0]), 1, 0).astype(np.int64)
    found_prev = np.ones(T, dtype=bool)
    indep_prev = model.uni_indep[ids].copy()
    cur_key = ids.astype(np.uint64)

    # ---- orders 2..N: one vectorized probe per order over the whole batch
    for k in range(2, N + 1):
        shift = k - 1
        prev_ids = np.zeros(T, dtype=np.int64)
        prev_ids[shift:] = ids[:-shift]
        valid = pos_in_doc >= shift
        key = combine_word_hash_np(cur_key, prev_ids.astype(np.uint64))
        reach = found_prev & ~indep_prev & valid
        if k < N:
            tab = model.middles[k - 2]
            hit, idxc = _lookup(tab, key)
            hit &= reach
            prob_matched = np.where(hit, tab.prob[idxc], prob_matched)
            match_len = np.where(hit, k, match_len)
            bo[k - 1] = np.where(hit, tab.backoff[idxc], np.float32(0.0))
            ext_len = np.where(hit & _has_ext(bo[k - 1]), k, ext_len)
            found_prev = hit
            indep_prev = np.where(hit, tab.indep[idxc], True)
            cur_key = key
        else:
            hit, idxc = _lookup(model.longest, key)
            hit &= reach
            prob_matched = np.where(hit, model.longest.prob[idxc], prob_matched)
            match_len = np.where(hit, k, match_len)

    # ---- in-state length: previous position's ext_len (BOS pseudo-position
    # included); 1 at BOS starts regardless (model.cc:103-112 sets
    # begin_sentence.length = 1 unconditionally — numerically neutral, kept
    # for state parity).
    in_len = np.zeros(T, dtype=np.int64)
    in_len[1:] = ext_len[:-1]
    in_len[is_doc_start] = 0
    if bos:
        first_scored = ext_off[:-1] + 1
        first_scored = first_scored[first_scored < ext_off[1:]]
        in_len[first_scored] = np.maximum(in_len[first_scored], 1)

    # ---- backoff charging, f32 sequential in ascending order (model.cc:172-175)
    tok_score = prob_matched.astype(np.float32, copy=True)
    for i in range(N - 1):
        bo_prev = np.zeros(T, dtype=np.float32)
        bo_prev[1:] = bo[i, :-1]
        charge = (match_len - 1 <= i) & (i < in_len) & ~is_doc_start
        tok_score = np.where(charge, tok_score + bo_prev, tok_score).astype(np.float32)

    # ---- per-document f32 fold in token order (np.add.at is unbuffered and
    # iterates in index order, matching the sequential accumulation of
    # /root/reference/src/model/mod.rs:194-199)
    totals = np.zeros(n_docs, dtype=np.float32)
    np.add.at(totals, doc_idx[scored], tok_score[scored])
    tokens = np.bincount(doc_idx[scored], minlength=n_docs).astype(np.int64)
    oov_mask = scored & (ids == 0)
    oov = np.bincount(doc_idx[oov_mask], minlength=n_docs).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ppl = np.power(10.0, -totals.astype(np.float64) / np.maximum(tokens, 1))
    ppl = np.where(tokens == 0, np.inf, ppl)

    return {
        "log10_prob": totals,
        "tokens": tokens,
        "oov": oov,
        "ppl": ppl,
        "tok_score": tok_score[scored],
        "ext_len": ext_len[scored],
        "scored_mask": scored,
    }


def score_documents(model: NGramModel, docs: list[list[str]], bos=True, eos=True):
    """Convenience: tokenized documents (lists of words) → score_batch."""
    doc_offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=doc_offsets[1:])
    flat = np.array([w for d in docs for w in d], dtype=object)
    ids = tokens_to_ids(model, flat)
    return score_batch(model, ids, doc_offsets, bos=bos, eos=eos)


def split_texts(texts) -> tuple[np.ndarray, np.ndarray]:
    """Split raw text on the exact KenLM delimiter set → (flat tokens, offsets)."""
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    all_tokens: list[str] = []
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").translate(_DELIM_TABLE).split(" ") if w]
        all_tokens.extend(toks)
        offsets[i + 1] = len(all_tokens)
    return np.array(all_tokens, dtype=object), offsets


_DELIM_TABLE = str.maketrans({c: " " for c in TOKEN_DELIMS})


def score_texts(model: NGramModel, texts, bos=True, eos=True):
    flat, offsets = split_texts(texts)
    ids = tokens_to_ids(model, flat)
    return score_batch(model, ids, offsets, bos=bos, eos=eos)
