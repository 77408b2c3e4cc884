"""C4 cleaning rules (ops/c4.py): hand-built pages covering every rule
branch, plus the plan law (pure expressions, zero Exchange)."""


def test_c4_rules_hand(spark):
    from kenlm_rs_spark.ops.c4 import c4_page_stats

    pages = [
        # keep: 5 kept lines with >=5 sentence marks
        (1, ["one two three.", "four five six!", "seven eight nine?",
             "ten eleven twelve.", "so it goes on."]),
        # lorem page (case-insensitive)
        (2, ["fine line here.", "Lorem Ipsum dolor.", "more text here.",
             "a b c.", "d e f.", "g h i."]),
        # curly brace page
        (3, ["good line one.", "var x = { }", "good line two.",
             "a b c.", "d e f.", "g h i."]),
        # too few sentences: lines fail terminal punct or min words
        (4, ["no terminal punct", "ok.", "tiny.", "x y z"]),
        # javascript line is dropped at LINE level (page may still keep)
        (5, ["please enable javascript now.", "one two three.",
             "four five six.", "seven eight nine.", "ten eleven twelve.",
             "last full line here."]),
    ]
    df = spark.createDataFrame(pages, "doc_id long, lines array<string>")
    got = {r["doc_id"]: r for r in c4_page_stats(df).collect()}
    assert got[1]["c4_keep"] and got[1]["n_kept_lines"] == 5
    assert got[2]["drop_reason"] == "lorem_ipsum" and got[2]["has_lorem"]
    assert got[3]["drop_reason"] == "curly_brace"
    assert got[4]["drop_reason"] == "too_few_sentences"
    # 'tiny.' has <3 words, 'ok.' too, 'x y z' no terminal: only 0 kept
    assert got[4]["n_kept_lines"] == 0 and got[4]["n_sentences"] == 0
    # page 5: js line excluded from kept (5 kept of 6), still keeps
    assert got[5]["n_kept_lines"] == 5 and got[5]["c4_keep"]

    plan = c4_page_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
