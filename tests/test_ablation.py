"""Filter ablation report (ops/ablation.py): hand-checked counts on a
tiny corpus, Σ n_first == n_dropped, subset-rule structure (a rule
dominated by an earlier rule gets n_first contributions only where the
earlier one missed), null-flag handling, grouping, validation, and
Spark == DuckDB twin (ablation_sql) equality."""

import duckdb
import pandas as pd
import pytest

from kenlm_rs_spark.ops.ablation import ablation_sql, filter_ablation

RULES = [
    ("short", "length(text) < 10"),
    ("tiny", "length(text) < 5"),        # subset of short
    ("no_x", "instr(text, 'x') = 0"),
]

DOCS = [
    (0, "aaaa"),        # short, tiny, no_x
    (1, "aaaaaaa"),     # short, no_x
    (2, "aaaaaaaaaaaaaaax"),  # none
    (3, "bbbbbbbbbbbb"),      # no_x only
    (4, "xx"),          # short, tiny
]


def _by_rule(rows):
    return {r["rule"]: r for r in rows}


def test_hand_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = _by_rule(filter_ablation(df, RULES).collect())
    assert set(out) == {"short", "tiny", "no_x"}
    s, t, n = out["short"], out["tiny"], out["no_x"]
    assert (s["n_flagged"], s["n_unique"], s["n_first"]) == (3, 0, 3)
    # tiny is a strict subset of short: never unique, never first
    assert (t["n_flagged"], t["n_unique"], t["n_first"]) == (2, 0, 0)
    assert (n["n_flagged"], n["n_unique"], n["n_first"]) == (3, 1, 1)
    for r in (s, t, n):
        assert (r["n_docs"], r["n_dropped"]) == (5, 4)
    # the waterfall is exact
    assert s["n_first"] + t["n_first"] + n["n_first"] == s["n_dropped"]


def test_null_text_is_unflagged(spark):
    df = spark.createDataFrame(
        [(0, "aaaa"), (1, None)], "doc_id long, text string"
    )
    out = _by_rule(filter_ablation(df, RULES).collect())
    assert out["short"]["n_docs"] == 2
    assert out["short"]["n_flagged"] == 1  # NULL predicate -> not flagged
    assert out["no_x"]["n_flagged"] == 1


def test_grouped(spark):
    rows = [(i, t, "a" if i % 2 == 0 else "b") for i, t in DOCS]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = filter_ablation(df, RULES, group_cols=["grp"]).collect()
    assert len(out) == 6  # 2 groups x 3 rules
    a = {r["rule"]: r for r in out if r["grp"] == "a"}
    assert a["short"]["n_docs"] == 3 and a["short"]["n_flagged"] == 2


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        filter_ablation(df, [])
    with pytest.raises(ValueError):
        filter_ablation(df, [("a", "1=1"), ("a", "1=0")])


def test_duckdb_twin_identical(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        filter_ablation(df, RULES)
        .toPandas()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = (
        con.execute(ablation_sql(RULES, "docs") + " ORDER BY rule")
        .fetchdf()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    for c in ["rule", "n_flagged", "n_unique", "n_first", "n_docs", "n_dropped"]:
        assert list(got[c]) == list(want[c]), c
