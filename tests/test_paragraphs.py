"""Paragraph-level CCNet filtering: per-paragraph scoring, order-preserving
reassembly, all-dropped and all-kept edge cases."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

EN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "lms", "en.arpa",
)

GOOD = "the cat sat on the mat and the dog sat on the rug near the door"
JUNK = "zzqq flrpt xyzzy blorp wubble quux zork grue plugh frobozz nitfol"


@pytest.fixture(scope="module")
def bc_model(spark):
    from kenlm_rs_spark.lm.model import NGramModel

    if not os.path.exists(EN):
        pytest.skip("en.arpa fixture missing")
    return spark.sparkContext.broadcast(NGramModel.load(EN))


def _cutoff(spark, bc_model):
    """midpoint between the known-good and known-junk paragraph ppl."""
    from kenlm_rs_spark.lm.score import score_texts

    r = score_texts(bc_model.value, [GOOD, JUNK])
    assert r["ppl"][0] < r["ppl"][1]
    return float((r["ppl"][0] + r["ppl"][1]) / 2)


def test_paragraph_filter_keeps_clean_paragraphs_in_order(spark, bc_model):
    from kenlm_rs_spark.ops.paragraphs import paragraph_filter

    cutoff = _cutoff(spark, bc_model)
    g1, g2 = GOOD, GOOD.replace("cat", "bird")
    docs = spark.createDataFrame(
        [
            (1, f"{g1}\n{JUNK}\n{g2}"),
            (2, f"{JUNK}\n{JUNK}"),
            (3, g1),
            (4, f"\n{g1}\n\n{JUNK}\n"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_filter(docs, bc_model, ppl_cutoff=cutoff).collect()
    }
    assert out[1]["text_clean"] == f"{g1}\n{g2}"  # junk removed, order kept
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 2
    assert out[2]["text_clean"] == "" and out[2]["n_kept"] == 0
    assert out[3]["text_clean"] == g1 and out[3]["kept_frac"] == 1.0
    assert out[4]["text_clean"] == g1  # empty paragraphs never counted
    assert out[4]["n_paras"] == 2


def test_split_paragraphs_positions(spark):
    from kenlm_rs_spark.ops.paragraphs import split_paragraphs

    docs = spark.createDataFrame([(7, "a\n\nb\nc")], "doc_id long, text string")
    rows = sorted(
        (r["para_idx"], r["para"]) for r in split_paragraphs(docs).collect()
    )
    assert rows == [(0, "a"), (2, "b"), (3, "c")]


def test_split_paragraphs_literal_metachar_sep(spark):
    """sep is a LITERAL, not a regex: '.', '|' and '\\E' must split only on
    the exact string (ADVICE r2 — F.split treats its arg as a Java regex)."""
    from kenlm_rs_spark.ops.paragraphs import split_paragraphs

    docs = spark.createDataFrame(
        [(1, "one.two.three"), (2, "a|b|c"), (3, r"x\Ey\Ez")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["para_idx"]): r["para"]
        for r in split_paragraphs(docs, sep=".").collect()
        if r["doc_id"] == 1
    }
    assert got == {(1, 0): "one", (1, 1): "two", (1, 2): "three"}
    got2 = [r["para"] for r in split_paragraphs(docs, sep="|").collect() if r["doc_id"] == 2]
    assert sorted(got2) == ["a", "b", "c"]
    got3 = [r["para"] for r in split_paragraphs(docs, sep="\\E").collect() if r["doc_id"] == 3]
    assert sorted(got3) == ["x", "y", "z"]


def test_paragraph_dedup_first_occurrence_wins(spark):
    """CCNet dedup law: a paragraph survives only at its first
    (doc_id, para_idx) across the corpus; docs reassemble from survivors;
    all-duplicate docs come out empty."""
    from kenlm_rs_spark.ops.paragraphs import paragraph_dedup

    BOILER = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique one\n{BOILER}\nunique two"),
            (2, f"{BOILER}\nfresh content"),
            (3, BOILER),                       # all duplicates -> empty
            (4, "repeated\nrepeated\nother"),  # within-doc dup
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[1]["text_clean"] == f"unique one\n{BOILER}\nunique two"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    assert got[2]["text_clean"] == "fresh content"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert got[3]["text_clean"] == "" and got[3]["n_kept"] == 0
    assert got[4]["text_clean"] == "repeated\nother"
    assert (got[4]["n_paras"], got[4]["n_kept"]) == (3, 2)


def test_boilerplate_removal_kill_all_policy(spark):
    """Frequency-threshold law: a paragraph occurring > max_count times
    corpus-wide disappears from EVERY doc (no canonical survivor, unlike
    paragraph_dedup); paragraphs at or under the threshold are untouched
    everywhere, within-doc occurrences all count toward the frequency."""
    import pytest

    from kenlm_rs_spark.ops.paragraphs import remove_boilerplate_paragraphs

    FOOTER = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"unique one\n{FOOTER}\ntwice"),
            (2, f"{FOOTER}\ntwice"),          # 'twice' occurs 2x total
            (3, f"{FOOTER}\nfresh"),
            (4, FOOTER),                      # footer occurs 4x -> boiler
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in remove_boilerplate_paragraphs(docs, max_count=3).collect()
    }
    assert got[1]["text_clean"] == "unique one\ntwice"
    assert (got[1]["n_paras"], got[1]["n_kept"], got[1]["n_boiler"]) == (3, 2, 1)
    assert got[2]["text_clean"] == "twice"
    assert got[3]["text_clean"] == "fresh"
    assert got[4]["text_clean"] == "" and got[4]["n_boiler"] == 1
    # max_count=4 lets the footer survive everywhere, original order kept
    all_kept = {
        r["doc_id"]: r
        for r in remove_boilerplate_paragraphs(docs, max_count=4).collect()
    }
    assert all_kept[1]["text_clean"] == f"unique one\n{FOOTER}\ntwice"
    assert all_kept[4]["text_clean"] == FOOTER
    with pytest.raises(ValueError):
        remove_boilerplate_paragraphs(docs, max_count=0)
