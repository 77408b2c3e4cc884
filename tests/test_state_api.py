"""K15 GetState / K16 FullScoreForgotState parity laws.

Laws (model.cc:180-245):
- scoring a sentence token-by-token, the carried out_state after each step
  must equal get_state(last context words, most recent first) exactly
  (words, backoffs, length);
- full_score_forgot_state(ctx, w) must equal full_score(get_state(ctx), w)
  BIT-exactly — the same backoff values are charged in the same f32 order.
"""

from __future__ import annotations

import numpy as np
import pytest

BIN = "/root/reference/test_data/test.bin"
CAROL = "/root/reference/test_data/carol.bin"

SENTS = [
    "looking on a little more loin also would consider higher",
    "screening a little more loin",
    "some biarritz unknownword on a",
    "the register of his burial was signed",
]


@pytest.fixture(scope="module", params=[BIN, CAROL])
def model(request):
    import os

    from kenlm_rs_spark.lm.model import NGramModel

    if not os.path.exists(request.param):
        pytest.skip("fixture binary missing")
    return NGramModel.load(request.param)


def test_get_state_matches_scoring_walk(model):
    for sent in SENTS:
        ids = [model.get_word_idx(w) for w in sent.split()]
        state = model.null_state()
        for t, wid in enumerate(ids):
            _, state = model.score_index_given_state(state, wid)
            ctx_rev = list(reversed(ids[: t + 1]))[: model.order - 1]
            rebuilt = model.get_state(ctx_rev)
            L = state.length
            assert rebuilt.length == L, (sent, t)
            # only the first `length` words/backoffs are live state
            # (GetState copies words[0:length]; full_score may carry the
            # scored word in the list even at length 0)
            assert rebuilt.words[:L] == state.words[:L], (sent, t)
            assert [np.float32(b) for b in rebuilt.backoff[:L]] == [
                np.float32(b) for b in state.backoff[:L]
            ], (sent, t)


def test_forgot_state_equals_state_walk(model):
    for sent in SENTS:
        ids = [model.get_word_idx(w) for w in sent.split()]
        for t in range(1, len(ids)):
            ctx_rev = list(reversed(ids[:t]))
            w = ids[t]
            via_state, out_a = model.score_index_given_state(
                model.get_state(ctx_rev), w
            )
            via_forgot, out_b, _, _ = model.full_score_forgot_state(ctx_rev, w)
            assert np.float32(via_state) == np.float32(via_forgot), (sent, t)
            assert out_a.length == out_b.length


def test_get_state_empty_and_oov(model):
    assert model.get_state([]).length == 0
    st = model.get_state([0])  # <unk> context
    assert st.length in (0, 1)
    total, _, n, _ = model.full_score_forgot_state([0], model.get_word_idx("a"))
    assert total < 0 and n >= 1
