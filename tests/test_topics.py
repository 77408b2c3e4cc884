"""Keyword-taxonomy topic tagging (ops/topics.py): hand counts, argmax
tie-break, totality over empty/null/no-hit docs, validation, and
Spark == DuckDB twin equality."""

import duckdb
import pandas as pd
import pytest

from kenlm_rs_spark.ops.topics import topic_tag, topic_tag_sql

TAX = (
    ("code", "tech"), ("data", "tech"),
    ("stock", "finance"), ("bank", "finance"),
    ("game", "sports"),
)

DOCS = [
    (0, "the code and the data and more code"),   # tech 3
    (1, "stock bank stock game game game"),       # finance 3 == sports 3
    (2, "nothing matches here"),                  # no hits
    (3, ""),                                      # empty
    (4, None),                                    # null
    (5, "Code DATA\tbank"),                       # case-fold + tab split
]


def _rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in topic_tag(df, TAX).collect()}


def test_hand_counts(spark):
    out = _rows(spark)
    assert len(out) == 6  # total
    assert out[0]["topic"] == "tech"
    assert (out[0]["n_hits"], out[0]["topic_hits"]) == (3, 3)
    assert out[0]["n_tokens"] == 8
    assert out[0]["density"] == 0.375
    assert out[5]["topic"] == "tech"  # case-insensitive, 2 tech vs 1 finance
    assert out[5]["n_hits"] == 3


def test_tiebreak_alphabetical(spark):
    out = _rows(spark)
    # finance 3 == sports 3 -> min-struct tie-break picks 'finance'
    assert out[1]["topic"] == "finance"
    assert out[1]["topic_hits"] == 3
    assert out[1]["n_hits"] == 6


def test_totality(spark):
    out = _rows(spark)
    for i in (2, 3, 4):
        assert out[i]["topic"] is None
        assert out[i]["n_hits"] == 0
        assert out[i]["topic_hits"] == 0
    assert out[3]["n_tokens"] == 0 and out[3]["density"] is None
    assert out[2]["density"] == 0.0


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        topic_tag(df, (("a", "t1"), ("a", "t2")))


def test_duckdb_twin_identical(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = topic_tag(df, TAX).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = con.execute(topic_tag_sql("docs", TAX) + " ORDER BY doc_id").fetchdf()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        ga = got[c].astype(object).where(pd.notna(got[c]), None)
        wa = want[c].astype(object).where(pd.notna(want[c]), None)
        assert list(ga) == list(wa), c


def test_table_variant_matches_tuple(spark):
    from kenlm_rs_spark.ops.topics import topic_tag_table

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    tax_df = spark.createDataFrame(
        [(k.upper(), t) for k, t in TAX], "kw string, topic string"
    )  # table keywords arrive un-normalized; variant lowercases
    got = sorted(map(tuple, topic_tag_table(df, tax_df).collect()))
    want = sorted(map(tuple, topic_tag(df, TAX).collect()))
    assert got == want


def test_table_variant_rejects_ambiguous(spark):
    from kenlm_rs_spark.ops.topics import topic_tag_table

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    tax_df = spark.createDataFrame(
        [("code", "tech"), ("Code", "finance")], "kw string, topic string"
    )
    with pytest.raises(ValueError, match="multiple topics"):
        topic_tag_table(df, tax_df)
