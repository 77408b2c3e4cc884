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


def test_hashed_path_matches_string_path(spark):
    """VERDICT r3 item 7: the hashed scale path (xxhash64 broadcast, 8
    bytes/gram — opt-in, used by filter_job) must produce identical flags
    to the exact string path (the default, shared with the oracle)."""
    from kenlm_rs_spark.ops.decontam import contamination_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "totally unrelated text with nothing shared at all"),
            (3, "over the lazy dog is a bench phrase fragment"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "jumps over the lazy dog"), (101, "a bench phrase fragment")],
        "doc_id long, text string",
    )
    for n, mm in ((3, 1), (2, 2)):
        hashed = sorted(
            map(
                tuple,
                contamination_flags(
                    docs, bench, n=n, min_matches=mm, hashed=True
                ).collect(),
            )
        )
        exact = sorted(
            map(
                tuple,
                contamination_flags(
                    docs, bench, n=n, min_matches=mm, hashed=False
                ).collect(),
            )
        )
        assert hashed == exact


def test_hashed_path_broadcast_is_longs(spark):
    """The broadcast side of the hashed path carries only an 8-byte hash
    column (the point of the optimization)."""
    from kenlm_rs_spark.ops.decontam import contamination_flags

    docs = spark.range(10).selectExpr("id AS doc_id", "'a b c d e' AS text")
    bench = spark.range(2).selectExpr("id AS doc_id", "'a b c' AS text")
    df = contamination_flags(docs, bench, hashed=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "xxhash64" in df._jdf.queryExecution().analyzed().toString()


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
