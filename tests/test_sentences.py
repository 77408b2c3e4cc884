"""Sentence segmentation (ops/sentences.py): hand-split cases, boundary
subset semantics (abbreviations NOT split unless followed by space +
upper/digit), empty/null totality, explode ordering, and Spark == DuckDB
twin equality."""

import duckdb
import pandas as pd

from kenlm_rs_spark.ops.sentences import (
    explode_sentences,
    sentence_stats,
    sentence_stats_sql,
)

DOCS = [
    (0, "Hello there. How are you? Fine!"),
    (1, "One sentence only"),
    (2, "Dr. Smith went home. He slept."),   # "Dr. S" DOES split (subset)
    (3, "lower. case continues. 5 Numbers split. Yes."),
    (4, ""),
    (5, None),
    (6, "Multi!! Marks?! Kept. Ok"),
]


def _rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in sentence_stats(df).collect()}


def test_hand_splits(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in explode_sentences(df).collect():
        got.setdefault(r["doc_id"], []).append(r["sentence"])
    assert got[0] == ["Hello there.", "How are you?", "Fine!"]
    assert got[1] == ["One sentence only"]
    # the frozen subset splits after "Dr." because "Smith" starts upper
    assert got[2] == ["Dr.", "Smith went home.", "He slept."]
    # lowercase continuation never splits; digit start does
    assert got[3] == ["lower. case continues.", "5 Numbers split.", "Yes."]
    assert got[6] == ["Multi!!", "Marks?!", "Kept.", "Ok"]


def test_stats_and_totality(spark):
    out = _rows(spark)
    assert out[0]["n_sentences"] == 3
    assert out[0]["n_sent_chars"] == len("Hello there.") + len(
        "How are you?"
    ) + len("Fine!")
    for i in (4, 5):
        assert out[i]["n_sentences"] == 0
        assert out[i]["n_sent_chars"] == 0
        assert out[i]["mean_sent_len"] is None
    assert out[1]["mean_sent_len"] == float(len("One sentence only"))


def test_duckdb_twin_identical(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sentence_stats(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = con.execute(
        sentence_stats_sql("docs") + " ORDER BY doc_id"
    ).fetchdf()
    con.close()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        ga = got[c].astype(object).where(pd.notna(got[c]), None)
        wa = want[c].astype(object).where(pd.notna(want[c]), None)
        assert list(ga) == list(wa), c
