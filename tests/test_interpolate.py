"""Model interpolation (J2/J3): merged model must normalize exactly and
interpolate perplexity between components."""

import io

import pytest

from kenlm_rs_spark.builder.interpolate import interpolate_models
from kenlm_rs_spark.lm.arpa import read_arpa, write_arpa
from kenlm_rs_spark.lm.model import NGramModel
from kenlm_rs_spark.lm.score import score_texts
from kenlm_rs_spark.pipeline.corpus import training_corpus


@pytest.fixture(scope="module")
def mix_model():
    en = NGramModel.load("fixtures/lms/en.arpa")
    de = NGramModel.load("fixtures/lms/de.arpa")
    mix = interpolate_models([en, de], [0.5, 0.5])
    buf = io.StringIO()
    write_arpa(mix, buf)
    buf.seek(0)
    return en, de, NGramModel.from_arpa(read_arpa(buf))


def _mass(m, ctx, bos=False):
    st = m.bos_state() if bos else m.null_state()
    for w in ctx:
        _, st = m.score_word_given_state(st, w)
    return sum(
        10 ** m.full_score(st, m.get_word_idx(w))[0]
        for w in m.words
        if w != "<s>"
    )


def test_interpolated_model_normalizes(mix_model):
    en, de, mix = mix_model
    assert _mass(mix, []) == pytest.approx(1.0, abs=1e-4)
    assert _mass(mix, [], bos=True) == pytest.approx(1.0, abs=1e-4)
    assert _mass(mix, [en.words[10]]) == pytest.approx(1.0, abs=1e-4)
    assert _mass(mix, [de.words[10]]) == pytest.approx(1.0, abs=1e-4)


def test_interpolated_ppl_between_components(mix_model):
    en, de, mix = mix_model

    def ppl(model, lang):
        test = training_corpus(lang, 5050)[5000:]
        r = score_texts(model, test, bos=True, eos=True)
        return 10 ** (
            -(float(r["log10_prob"].astype("float64").sum()) / int(r["tokens"].sum()))
        )

    for lang, own in (("en", en), ("de", de)):
        own_ppl = ppl(own, lang)
        mix_ppl = ppl(mix, lang)
        # mixing halves each word's prob at worst -> ppl at most ~2x the
        # matched single model, far below the ~4000 of the mismatched one
        assert own_ppl < mix_ppl < own_ppl * 2.5
