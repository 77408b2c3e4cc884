"""Winnowing fingerprints: the substring-sharing guarantee, edge cases,
and exact Spark<->DuckDB set parity (shared md5-prefix hash law)."""

import duckdb
from pyspark.sql import functions as F

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "short",                      # shorter than k -> no fingerprints
    "",
    "aaaaaaaaaaaaaaaa",           # all k-grams identical -> 1 fingerprint
    "the quick brown cat jumps over the lazy dog",  # shares long substrings with 0
]


def test_winnow_guarantee_and_edges(spark):
    from kenlm_rs_spark.ops.winnow import K_GRAM, WINDOW, winnow_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i long, t string"
    )
    got = {
        r["i"]: r["f"]
        for r in df.select("i", winnow_fingerprints(F.col("t")).alias("f")).collect()
    }
    assert got[1] == [] and got[2] == []
    assert len(got[3]) == 1
    # winnowing guarantee: docs 0 and 4 share substrings of length
    # >= K_GRAM + WINDOW - 1 ("jumps over the lazy dog") -> shared fp
    assert set(got[0]) & set(got[4])
    # sorted distinct
    assert got[0] == sorted(set(got[0]))


def test_winnow_spark_duckdb_parity(spark):
    from kenlm_rs_spark.ops.winnow import (
        kgram_hashes_sql,
        winnow_fingerprints,
        winnow_from_hashes_sql,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i long, t string"
    )
    got = {
        r["i"]: r["f"]
        for r in df.select("i", winnow_fingerprints(F.col("t")).alias("f")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE x(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO x VALUES (?,?)", list(enumerate(TEXTS)))
    want = dict(
        con.sql(
            f"WITH h AS (SELECT i, {kgram_hashes_sql('t')} AS hs FROM x) "
            f"SELECT i, {winnow_from_hashes_sql('hs')} FROM h"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_winnow_table_candidate_blocking(spark):
    """Docs sharing a long substring collide in the exploded fingerprint
    index (the candidate-generation shape); unrelated docs do not."""
    from kenlm_rs_spark.ops.winnow import winnow_table

    df = spark.createDataFrame(
        [
            (1, "completely original sentence about databases and queries"),
            (2, "another text with a completely original sentence about databases inside"),
            (3, "zzz qqq vvv unrelated gibberish content 12345 67890"),
        ],
        "doc_id long, text string",
    )
    t = winnow_table(df)
    pairs = (
        t.alias("a")
        .join(t.alias("b"), (F.col("a.fingerprint") == F.col("b.fingerprint"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    got = {(r["x"], r["y"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_winnow_candidate_pairs_and_cached_deps(spark):
    from kenlm_rs_spark.ops.winnow import winnow_candidate_pairs

    df = spark.createDataFrame(
        [
            (1, "completely original sentence about databases and queries today"),
            (2, "prefix then a completely original sentence about databases and queries too"),
            (3, "zzz qqq vvv unrelated gibberish content 12345 67890 zig zag"),
        ],
        "doc_id long, text string",
    )
    out = winnow_candidate_pairs(df, max_fp_freq=10, min_shared=3)
    rows = {(r["id_a"], r["id_b"]): r["shared_fps"] for r in out.collect()}
    assert (1, 2) in rows and rows[(1, 2)] >= 3
    assert not any(3 in p for p in rows)
    # r7: the single-aggregation pair-generation shape needs no cache — the
    # handle must still exist (caller contract) and unpersist must be safe
    deps = out.cached_deps
    assert deps == [] or all(d.is_cached for d in deps)
    for d in deps:
        d.unpersist()
