"""Benchmark decontamination: verbatim n-gram overlap flags + the broadcast
plan law (the corpus side must join against a broadcast benchmark-gram set,
never shuffle corpus-sized data into the join)."""

from __future__ import annotations


def test_contamination_flags_semantics(spark):
    from kenlm_rs_spark.ops.decontam import contamination_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),       # contains bench trigram
            (2, "totally unrelated text here now"),
            (3, "quick brown fox somewhere else"),  # same trigram, 1 distinct match
            (4, "the quick brown the quick brown fox"),  # dup grams count once
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appeared")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_matched"], r["contaminated"])
        for r in contamination_flags(docs, bench, n=3).collect()
    }
    # bench grams: "a quick brown", "quick brown fox", "brown fox appeared";
    # doc 1 contains exactly "quick brown fox"
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3][1] is True
    assert got[4][0] == got[3][0]  # duplicates in doc count once (distinct)


def test_contamination_plan_broadcasts_benchmark(spark):
    from kenlm_rs_spark.ops.decontam import contamination_flags

    docs = spark.range(100).selectExpr("id AS doc_id", "'a b c d e' AS text")
    bench = spark.range(2).selectExpr("id AS doc_id", "'a b c' AS text")
    plan = (
        contamination_flags(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan
