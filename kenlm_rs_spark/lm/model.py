"""Canonical in-memory n-gram language model + exact KenLM scoring semantics.

This is a from-scratch reimplementation of the scoring path of
twuebi/kenlm-rs — semantics cited from the reference:

- single-pass longest-match scoring with stored-backoff charging:
  /root/reference/src/cxx/lm/model.cc:169-177 (FullScore),
  :300-333 (ScoreExceptBackoff), :336-368 (ResumeScore)
- hashed n-gram keys: CombineWordHash chain,
  /root/reference/src/cxx/lm/search_hashed.hh:25-28, chain order
  /root/reference/src/cxx/lm/search_hashed.cc:184-187
- signed-zero backoff extension flags (kNoExtensionBackoff = -0.0):
  /root/reference/src/cxx/lm/blank.hh:22-38
- ARPA construction incl. blank hallucination for SRI-pruned models and
  context activation: /root/reference/src/cxx/lm/search_hashed.cc:24-136,
  :159-203 (ReadNGrams), :259-291 (ApplyBuild)
- missing-<unk> defaults: prob -100, backoff +0.0
  (/root/reference/src/cxx/lm/model.cc:152-158, config.cc:16)

Physical layout differs deliberately (Spark-first design): instead of probing
hash tables or a bit-packed trie, every order is a sorted uint64 key array +
float32 payload arrays probed with np.searchsorted, which vectorizes across
thousands of tokens per Arrow batch. Results are identical.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .arpa import ArpaSections, read_arpa
from .murmur import combine_word_hash, hash_for_vocab

U64 = np.uint64
NEG_ZERO_BITS = np.uint32(0x80000000)


def has_extension_f32(value: float) -> bool:
    """HasExtension: bit-compare against -0.0 (blank.hh:32-38)."""
    bits = np.float32(value).view(np.uint32)
    return bits != NEG_ZERO_BITS


def _has_extension_arr(values: np.ndarray) -> np.ndarray:
    return values.astype(np.float32, copy=False).view(np.uint32) != NEG_ZERO_BITS


@dataclass
class State:
    """Scoring state: matched context words (most-recent-first) + their
    backoffs (/root/reference/src/cxx/lm/state.hh:45-47)."""

    words: list[int] = field(default_factory=list)
    backoff: list[float] = field(default_factory=list)
    length: int = 0


class _OrderTable:
    """Sorted-key lookup table for one n-gram order (frozen)."""

    __slots__ = ("keys", "prob", "backoff", "indep")

    def __init__(self, keys, prob, backoff=None, indep=None):
        order = np.argsort(keys, kind="stable")
        self.keys = np.asarray(keys, dtype=np.uint64)[order]
        self.prob = np.asarray(prob, dtype=np.float32)[order]
        self.backoff = (
            None if backoff is None else np.asarray(backoff, dtype=np.float32)[order]
        )
        self.indep = None if indep is None else np.asarray(indep, dtype=bool)[order]

    def find(self, key: int):
        """Return row index or -1."""
        k = np.uint64(key)
        i = int(np.searchsorted(self.keys, k))
        if i < len(self.keys) and self.keys[i] == k:
            return i
        return -1

    def __len__(self):
        return len(self.keys)


class NGramModel:
    """Kneser-Ney backoff n-gram LM with KenLM-exact scoring."""

    def __init__(
        self,
        order: int,
        counts: list[int],
        uni_prob: np.ndarray,
        uni_backoff: np.ndarray,
        uni_indep: np.ndarray,
        middles: list[_OrderTable],
        longest: _OrderTable,
        words: list[str] | None,
        vocab_hashes: np.ndarray | None = None,
        vocab_hash_ids: np.ndarray | None = None,
        fixed_parameters=None,
    ):
        self.order = order
        self.counts = counts
        self.uni_prob = uni_prob.astype(np.float32, copy=False)
        self.uni_backoff = uni_backoff.astype(np.float32, copy=False)
        self.uni_indep = uni_indep.astype(bool, copy=False)
        self.middles = middles  # orders 2..N-1
        self.longest = longest  # order N (prob only)
        self.words = words
        self.word_to_id = {w: i for i, w in enumerate(words)} if words is not None else None
        self.vocab_hashes = vocab_hashes
        self.vocab_hash_ids = vocab_hash_ids
        self.fixed_parameters = fixed_parameters
        self.bound = len(uni_prob)
        self.bos_id = self.get_word_idx("<s>")
        self.eos_id = self.get_word_idx("</s>")
        # precomputed BOS state (model.cc:103-112)
        self._bos_backoff = float(self.uni_backoff[self.bos_id])

    # ------------------------------------------------------------------ vocab

    def get_word_idx(self, word: str) -> int:
        """Vocab lookup; 0 (<unk>) when absent (vocab.hh:71-82,160-163)."""
        if self.word_to_id is not None:
            return self.word_to_id.get(word, 0)
        if self.vocab_hashes is not None:
            h = np.uint64(hash_for_vocab(word))
            i = int(np.searchsorted(self.vocab_hashes, h))
            if i < len(self.vocab_hashes) and self.vocab_hashes[i] == h:
                return int(self.vocab_hash_ids[i])
            return 0
        raise ValueError("model has no vocabulary lookup structure")

    def get_word_idx_opt(self, word: str):
        idx = self.get_word_idx(word)
        return idx if idx != 0 else None

    def get_vocab(self):
        return self.words

    def get_count_header(self) -> list[int]:
        return self.counts

    def get_order(self) -> int:
        return self.order

    # ------------------------------------------------------------------ states

    def new_state(self) -> State:
        return State([], [], 0)

    def bos_state(self) -> State:
        return State([self.bos_id], [self._bos_backoff], 1)

    def null_state(self) -> State:
        return State([], [], 0)

    def get_state(self, context_rev) -> State:
        """K15 GetState (model.cc:215-245): build a State from a context
        alone (word ids, MOST RECENT FIRST) without scoring. Walks the
        lookup chain until the first missing middle; the state length is the
        longest prefix whose backoff carries the extension flag."""
        ctx = [int(w) for w in context_rev][: self.order - 1]
        if not ctx:
            return State([], [], 0)
        backoffs = [float(self.uni_backoff[ctx[0]])]
        length = 1 if has_extension_f32(backoffs[0]) else 0
        node = ctx[0]
        for i in range(1, len(ctx)):
            tab = self.middles[i - 1]
            key = combine_word_hash(node, ctx[i])
            j = tab.find(key)
            if j < 0:
                break
            bo = float(tab.backoff[j])
            backoffs.append(bo)
            if has_extension_f32(bo):
                length = i + 1
            node = key
        return State(ctx[:length], backoffs[: max(length, 1)], length)

    def full_score_forgot_state(self, context_rev, word_id: int):
        """K16 FullScoreForgotState (model.cc:180-212): score ``word_id``
        given a context ARRAY (ids, most recent first) instead of a carried
        State. Equals full_score(get_state(ctx), w) bit-exactly: the same
        backoff values are charged in the same ascending f32 order."""
        ctx = [int(w) for w in context_rev][: self.order - 1]
        # ScoreExceptBackoff: walk the context chain but charge nothing
        # (zero backoffs are exact f32 no-ops)
        pseudo = State(ctx, [0.0] * len(ctx), len(ctx))
        prob, out_state, ngram_length, indep = self.full_score(pseudo, word_id)
        total = np.float32(prob)
        start = ngram_length
        if len(ctx) < start:
            return float(total), out_state, ngram_length, indep
        if start <= 1:
            total = np.float32(total + np.float32(self.uni_backoff[ctx[0]]))
            start = 2
            node = ctx[0]
        else:
            # FastMakeNode over ctx[0 .. start-2]
            node = ctx[0]
            ok = True
            for k in range(1, start - 1):
                key = combine_word_hash(node, ctx[k])
                if self.middles[k - 1].find(key) < 0:
                    ok = False
                    break
                node = key
            if not ok:
                return float(total), out_state, ngram_length, indep
        for i in range(start - 1, len(ctx)):
            tab = self.middles[i - 1]
            key = combine_word_hash(node, ctx[i])
            j = tab.find(key)
            if j < 0:
                break
            total = np.float32(total + np.float32(tab.backoff[j]))
            node = key
        return float(total), out_state, ngram_length, indep

    # ------------------------------------------------------------------ scoring

    def full_score(self, in_state: State, word_id: int):
        """Exact FullScore (model.cc:169-177): returns
        (total_prob_f32, out_state, ngram_length, independent_left)."""
        w = int(word_id)
        prob = np.float32(self.uni_prob[w])
        ngram_length = 1
        indep = bool(self.uni_indep[w])
        out_backoff = [float(self.uni_backoff[w])]
        out_length = 1 if has_extension_f32(out_backoff[0]) else 0
        node = w

        hist = in_state.words[: in_state.length]
        # ResumeScore walk (model.cc:336-368)
        for i, h in enumerate(hist):
            if indep:
                break
            order = i + 2
            key = combine_word_hash(node, int(h))
            if order == self.order:
                indep = True
                j = self.longest.find(key)
                if j >= 0:
                    prob = np.float32(self.longest.prob[j])
                    ngram_length = self.order
                break
            tab = self.middles[order - 2]
            j = tab.find(key)
            if j < 0:
                indep = True
                break
            node = key
            indep = bool(tab.indep[j])
            bo = float(tab.backoff[j])
            out_backoff.append(bo)
            prob = np.float32(tab.prob[j])
            ngram_length = order
            if has_extension_f32(bo):
                out_length = order

        out_words = [w] + [int(x) for x in hist[: max(out_length - 1, 0)]]
        out_state = State(out_words, out_backoff[:max(out_length, 1)], out_length)

        # charge stored backoffs (model.cc:172-175), f32 sequential
        total = np.float32(prob)
        for i in range(ngram_length - 1, in_state.length):
            total = np.float32(total + np.float32(in_state.backoff[i]))
        return float(total), out_state, ngram_length, indep

    def score_index_given_state(self, in_state: State, word_id: int):
        total, out_state, _, _ = self.full_score(in_state, word_id)
        return total, out_state

    def score_word_given_state(self, in_state: State, word: str):
        return self.score_index_given_state(in_state, self.get_word_idx(word))

    def score_sentence(self, sentence, bos: bool = False, eos: bool = False) -> float:
        """Joint log10 prob with f32 accumulation
        (/root/reference/src/model/mod.rs:183-209)."""
        state = self.bos_state() if bos else self.null_state()
        score = np.float32(0.0)
        for w in sentence:
            out, state = self.score_word_given_state(state, w)
            score = np.float32(score + np.float32(out))
        if eos:
            out, state = self.score_index_given_state(state, self.eos_id)
            score = np.float32(score + np.float32(out))
        return float(score)

    def perplexity(self, sentence, bos: bool = True, eos: bool = True):
        """Query-tool semantics (/root/reference/src/cxx/lm/ngram_query.hh:52-101):
        returns (total_log10, tokens, oov, ppl_including_oov)."""
        state = self.bos_state() if bos else self.null_state()
        total = np.float32(0.0)
        oov = 0
        tokens = 0
        for w in sentence:
            idx = self.get_word_idx(w)
            if idx == 0:
                oov += 1
            out, state = self.score_index_given_state(state, idx)
            total = np.float32(total + np.float32(out))
            tokens += 1
        if eos:
            out, state = self.score_index_given_state(state, self.eos_id)
            total = np.float32(total + np.float32(out))
            tokens += 1
        ppl = math.pow(10.0, -float(total) / tokens) if tokens else float("inf")
        return float(total), tokens, oov, ppl

    # ------------------------------------------------------------------ loading

    @classmethod
    def load(cls, path: str, store_vocab: bool = True) -> "NGramModel":
        """Dispatch binary vs ARPA like ModelBuilder::build
        (/root/reference/src/model/builder.rs:71-105)."""
        from . import binary
        from .headers import is_binary_format

        if is_binary_format(path):
            return binary.load_binary(path, store_vocab=store_vocab)
        return cls.from_arpa(read_arpa(path))

    @classmethod
    def from_arpa(cls, sections: ArpaSections) -> "NGramModel":
        """Build hashed tables from ARPA records, mirroring ApplyBuild
        (/root/reference/src/cxx/lm/search_hashed.cc:259-291) including
        blank hallucination (FindLower/AdjustLower, :57-136) and context
        activation (:24-55)."""
        n_orders = sections.order
        if n_orders < 2:
            raise ValueError("this ngram implementation assumes at least a bigram model")
        counts = list(sections.counts)

        # --- vocab from the unigram section (insertion order; <unk>/<UNK> -> 0)
        words: list[str] = ["<unk>"]
        word_to_id: dict[str, int] = {}
        saw_unk = False
        uni_records = sections.backoffs[0]
        uni_prob_list: list[float] = [-100.0]  # unknown_missing_logprob default
        uni_backoff_list: list[float] = [0.0]  # model.cc:156 (positive zero)
        for rec in uni_records:
            w = rec.ngram[0]
            if w in ("<unk>", "<UNK>"):
                saw_unk = True
                uni_prob_list[0] = rec.log_prob
                uni_backoff_list[0] = rec.backoff
                continue
            word_to_id[w] = len(words)
            words.append(w)
            uni_prob_list.append(rec.log_prob)
            uni_backoff_list.append(rec.backoff)
        bound = len(words)
        uni_prob = np.array(uni_prob_list, dtype=np.float32)
        uni_backoff = np.array(uni_backoff_list, dtype=np.float32)
        uni_extends = np.zeros(bound, dtype=bool)

        def wid(w: str) -> int:
            return word_to_id.get(w, 0)

        # working mutable tables: key -> [prob(f32), backoff(f32), extends(bool)]
        mids: list[dict[int, list]] = [dict() for _ in range(n_orders - 2)]
        longest: dict[int, float] = {}

        def prob_of(ref):
            kind = ref[0]
            if kind == "uni":
                return float(uni_prob[ref[1]])
            return ref[2][0]

        def set_prob(ref, p):
            assert ref[0] == "mid"
            ref[2][0] = float(np.float32(p))

        def mark_extends(ref):
            if ref[0] == "uni":
                uni_extends[ref[1]] = True
            else:
                ref[2][2] = True

        for n in range(2, n_orders + 1):
            is_longest = n == n_orders
            records = sections.no_backoff if is_longest else sections.backoffs[n - 1]
            table = longest if is_longest else mids[n - 2]
            for rec in records:
                ids_fwd = [wid(w) for w in rec.ngram]
                vocab_ids = ids_fwd[::-1]  # reverse order, vocab_ids[0] = last word
                keys = [combine_word_hash(vocab_ids[0], vocab_ids[1])]
                for h in range(1, n - 1):
                    keys.append(combine_word_hash(keys[h - 1], vocab_ids[h + 1]))
                full_key = keys[n - 2]
                if is_longest:
                    table[full_key] = float(rec.log_prob)
                else:
                    table[full_key] = [float(rec.log_prob), float(rec.backoff), False]

                # FindLower: longest right-aligned existing entry, blanks on the way
                between: list = []
                lower = n - 3
                while True:
                    if lower == -1:
                        between.append(("uni", vocab_ids[0]))
                        break
                    k = keys[lower]
                    entry = mids[lower].get(k)
                    if entry is not None:
                        between.append(("mid", k, entry))
                        break
                    entry = [0.0, -0.0, False]  # blank, backoff = kNoExtensionBackoff
                    mids[lower][k] = entry
                    between.append(("mid", k, entry))
                    lower -= 1

                # AdjustLower (search_hashed.cc:81-136)
                if len(between) > 1:
                    prob = np.float32(-abs(prob_of(between[-1])))
                    basis = n - len(between)
                    change_i = len(between) - 2
                    assert basis != 0
                    if basis == 1:
                        ctx = vocab_ids[1]
                        bko = np.float32(uni_backoff[ctx])
                        if not has_extension_f32(bko):
                            uni_backoff[ctx] = np.float32(0.0)  # SetExtension
                        prob = np.float32(prob + bko)
                        set_prob(between[change_i], prob)
                        basis = 2
                        change_i -= 1
                    backoff_hash = vocab_ids[1]
                    for i in range(2, basis + 1):
                        backoff_hash = combine_word_hash(backoff_hash, vocab_ids[i])
                    while basis < n - 1:
                        got = mids[basis - 2].get(backoff_hash)
                        if got is not None:
                            bko = np.float32(got[1])
                            if not has_extension_f32(bko):
                                got[1] = 0.0  # SetExtension
                            prob = np.float32(prob + bko)
                        set_prob(between[change_i], prob)
                        backoff_hash = combine_word_hash(backoff_hash, vocab_ids[basis + 1])
                        basis += 1
                        change_i -= 1
                for ref in between:
                    mark_extends(ref)

                # activation of the context entry (ActivateUnigram / ActivateLowerMiddle)
                if n == 2:
                    ctx = vocab_ids[1]
                    if not has_extension_f32(np.float32(uni_backoff[ctx])):
                        uni_backoff[ctx] = np.float32(0.0)
                else:
                    h = vocab_ids[1]
                    for i in range(2, n):
                        h = combine_word_hash(h, vocab_ids[i])
                    got = mids[n - 3].get(h)
                    if got is None:
                        raise ValueError(
                            f"The context of every {n}-gram should appear as a {n - 1}-gram"
                        )
                    if not has_extension_f32(np.float32(got[1])):
                        got[1] = 0.0

        # freeze
        middles = []
        for d in mids:
            ks = np.fromiter(d.keys(), dtype=np.uint64, count=len(d))
            probs = np.fromiter((v[0] for v in d.values()), dtype=np.float32, count=len(d))
            bks = np.fromiter((v[1] for v in d.values()), dtype=np.float32, count=len(d))
            ext = np.fromiter((v[2] for v in d.values()), dtype=bool, count=len(d))
            middles.append(_OrderTable(ks, probs, bks, ~ext))
        lk = np.fromiter(longest.keys(), dtype=np.uint64, count=len(longest))
        lp = np.fromiter(longest.values(), dtype=np.float32, count=len(longest))
        longest_tab = _OrderTable(lk, lp)

        if not saw_unk:
            # MissingUnknown is tolerated with defaults (model.cc:152-158)
            pass

        model = cls(
            order=n_orders,
            counts=counts,
            uni_prob=uni_prob,
            uni_backoff=uni_backoff,
            uni_indep=~uni_extends,
            middles=middles,
            longest=longest_tab,
            words=words,
        )
        # gram inventory (ARPA records as word tuples, per order) — used by
        # model interpolation (J2) to enumerate the union of n-grams
        inventory: list[list[tuple]] = [[(w,) for w in words]]
        for o in range(2, n_orders):
            inventory.append([r.ngram for r in sections.backoffs[o - 1]])
        inventory.append([r.ngram for r in sections.no_backoff])
        model.gram_inventory = inventory
        return model
