"""Mixed-language detection (ops/mixed_lang.py): majority vote, integer
threshold boundary, count tie-break, and paragraph split fidelity."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.mixed_lang import mixed_language_stats, paragraph_langid


@pytest.fixture(scope="module")
def plang(spark):
    # hand-built (doc_id, para_idx, para_lang) — rollup logic only
    rows = [
        # doc 0: 7/10 en -> share exactly at threshold, NOT mixed (strict <)
        *[(0, i, "en") for i in range(7)],
        *[(0, 7 + i, "de") for i in range(3)],
        # doc 1: 2/3 en -> mixed (2*10 < 3*7)
        (1, 0, "en"), (1, 1, "en"), (1, 2, "es"),
        # doc 2: tie 1-1 -> lexicographically smaller lang wins
        (2, 0, "fr"), (2, 1, "de"),
        # doc 3: monolingual
        (3, 0, "es"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, para_idx int, para_lang string"
    )


def test_rollup(spark, plang):
    out = {
        r["doc_id"]: (r["n_paras"], r["top_lang"], r["top_cnt"], r["is_mixed"])
        for r in mixed_language_stats(plang).collect()
    }
    assert out[0] == (10, "en", 7, False)  # exactly 7/10 is not mixed
    assert out[1] == (3, "en", 2, True)
    assert out[2] == (2, "de", 1, True)  # tie breaks to 'de'
    assert out[3] == (1, "es", 1, False)


def test_threshold_is_rational(spark, plang):
    # at 2/3 the doc-1 share (2/3) is NOT strictly below -> not mixed
    out = {
        r["doc_id"]: r["is_mixed"]
        for r in mixed_language_stats(plang, mixed_num=2, mixed_den=3).collect()
    }
    assert out[1] is False


def test_paragraph_langid_end_to_end(spark):
    from kenlm_rs_spark.pipeline.langid import default_langid

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat and ate\nder hund lief durch den wald schnell")],
        "doc_id long, text string",
    )
    bc = spark.sparkContext.broadcast(default_langid())
    rows = paragraph_langid(docs, bc, sep="\n").collect()
    got = {r["para_idx"]: r["para_lang"] for r in rows}
    assert got == {0: "en", 1: "de"}


def test_validates_threshold(spark, plang):
    with pytest.raises(ValueError):
        mixed_language_stats(plang, mixed_num=0, mixed_den=3)
