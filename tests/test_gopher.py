"""Gopher rule set (Rae et al. 2021 A1.1): feature math + decision order on
hand-built documents covering each rule's trigger."""

from __future__ import annotations

import pytest


def _run(spark, rows):
    from kenlm_rs_spark.ops.gopher import gopher_decide, gopher_features

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r for r in gopher_decide(gopher_features(df)).collect()
    }


def test_gopher_rules_trigger_in_order(spark):
    long_ok = " ".join(["alpha beta gamma delta epsilon zeta"] * 12) + " the of and"
    got = _run(
        spark,
        [
            (1, long_ok),                                   # passes all
            (2, "too short"),                               # too_few_words
            (3, " ".join(["ab"] * 60) + " the of"),          # mean_word_len_low
            (4, " ".join(["supercalifragilistic"] * 60)),    # mean_word_len_high
            (5, " ".join(["word#tag"] * 60) + " the of"),    # symbol_ratio
            (6, " ".join(["12345 6789"] * 30) + " the of"),  # non_alpha_words
            (7, " ".join(["alpha beta gamma"] * 20)),        # stopwords (none)
        ],
    )
    assert got[1]["gopher_keep"] and got[1]["gopher_drop_reason"] is None
    assert got[2]["gopher_drop_reason"] == "too_few_words"
    assert got[3]["gopher_drop_reason"] == "mean_word_len_low"
    assert got[4]["gopher_drop_reason"] == "mean_word_len_high"
    assert got[5]["gopher_drop_reason"] == "symbol_ratio"
    assert got[6]["gopher_drop_reason"] == "non_alpha_words"
    assert got[7]["gopher_drop_reason"] == "stopwords"


def test_gopher_line_rules(spark):
    bullets = "\n".join(f"- item {i} of the list and more" for i in range(10))
    ellipses = "\n".join(
        ["the line that goes on and on..."] * 4 + ["a normal line of the text"] * 6
    )
    got = _run(
        spark,
        [
            (1, bullets + "\n" + "filler words of the and that " * 10),
            (2, ellipses + "\n" + "filler words of the and that " * 10),
        ],
    )
    # bullets: 10 of 11 lines bulleted -> 0.909 > 0.9 -> dropped
    assert got[1]["gopher_drop_reason"] == "bullet_lines"
    # ellipses: 4 of 11 lines -> 0.364 > 0.3 -> dropped
    assert got[2]["gopher_drop_reason"] == "ellipsis_lines"


def test_gopher_feature_values(spark):
    got = _run(spark, [(1, "the cat sat")])
    r = got[1]
    assert r["g_n_words"] == 3
    assert r["g_mean_word_len"] == pytest.approx((3 + 3 + 3) / 3)
    assert r["g_n_stopwords"] == 1  # only 'the'
    assert r["g_alpha_word_frac"] == 1.0
    assert r["gopher_drop_reason"] == "too_few_words"


def test_gopher_repetition_features(spark):
    """Hand-computed repetition signals: duplicate lines + top-n-gram char
    fractions with deterministic tie-break."""
    from kenlm_rs_spark.ops.gopher import gopher_repetition

    docs = spark.createDataFrame(
        [
            (1, "a b\na b\nc"),        # dup lines: 3 lines, 2 distinct
            (2, "x y x y x"),          # top2gram 'x y' (tie with 'y x'), c=2
            (3, "unique line only"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    import pytest as _pt

    assert got[1]["dup_line_frac"] == _pt.approx(1 / 3)
    # repeated occurrences beyond first: 1x'a b' (3 chars) of 7 line chars
    assert got[1]["dup_line_char_frac"] == _pt.approx(3 / 7)
    # doc 2: len('x y')=3, c=2, len(text)=9
    assert got[2]["top2gram_char_frac"] == _pt.approx(6 / 9)
    assert got[3]["dup_line_frac"] == 0.0
    # single-occurrence grams: top c=1, smallest gram wins, frac = len/len(text)
    assert got[3]["top2gram_char_frac"] > 0
