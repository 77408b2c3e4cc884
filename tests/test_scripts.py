"""Unicode script profiling (ops/scripts.py): hand counts on mixed-script
strings, dominant-script priority tie-break, null/empty handling, and
Spark == DuckDB twin equality (the frozen literal-range classes must
compile identically in Java regex and RE2)."""

import duckdb
import pandas as pd

from kenlm_rs_spark.ops.scripts import (
    SCRIPT_NAMES,
    script_profile,
    script_profile_sql,
)

DOCS = [
    (0, "hello world"),                      # pure latin
    (1, "привет hello"),                     # cyrillic 6 vs latin 5
    (2, "日本語のテキスト"),                   # cjk 3 + kana 5
    (3, "مرحبا بالعالم"),                    # arabic
    (4, ""),                                  # empty
    (5, None),                                # null
    (6, "ab ба"),                             # tie latin 2 == cyrillic 2
    (7, "1234 !!!"),                          # no scripted chars
    (8, "καλημέρα κόσμε"),                   # greek
    (9, "안녕하세요 hello"),                  # hangul 5 vs latin 5 tie
]


def _rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in script_profile(df).collect()}


def test_hand_counts(spark):
    out = _rows(spark)
    assert out[0]["n_latin"] == 10 and out[0]["dominant_script"] == "latin"
    assert out[0]["dominant_ratio"] == 1.0
    assert out[1]["n_cyrillic"] == 6 and out[1]["n_latin"] == 5
    assert out[1]["dominant_script"] == "cyrillic"
    assert out[2]["n_cjk"] == 3 and out[2]["n_kana"] == 5
    assert out[2]["dominant_script"] == "kana"
    assert out[3]["dominant_script"] == "arabic"
    assert out[8]["dominant_script"] == "greek"


def test_empty_null_unscripted(spark):
    out = _rows(spark)
    for i in (4, 5, 7):
        assert out[i]["n_scripted"] == 0
        assert out[i]["dominant_script"] is None
        assert out[i]["dominant_ratio"] is None
    assert out[7]["n_chars"] == 8
    assert out[5]["n_chars"] == 0  # null -> ''


def test_priority_tiebreak(spark):
    out = _rows(spark)
    # latin is listed before cyrillic and hangul: ties go latin
    assert out[6]["n_latin"] == out[6]["n_cyrillic"] == 2
    assert out[6]["dominant_script"] == "latin"
    assert out[9]["n_hangul"] == out[9]["n_latin"] == 5
    assert out[9]["dominant_script"] == "latin"


def test_duckdb_twin_identical(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = script_profile(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = con.execute(
        script_profile_sql("docs") + " ORDER BY doc_id"
    ).fetchdf()
    cols = (
        ["doc_id", "n_chars"]
        + [f"n_{n}" for n in SCRIPT_NAMES]
        + ["n_scripted", "dominant_script", "dominant_ratio"]
    )
    assert list(got.columns) == list(want.columns) == cols
    for c in cols:
        ga = got[c].astype(object).where(pd.notna(got[c]), None)
        wa = want[c].astype(object).where(pd.notna(want[c]), None)
        assert list(ga) == list(wa), c
