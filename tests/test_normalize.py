"""Unicode NFC normalization: composition semantics + DuckDB parity."""

import duckdb
from pyspark.sql import functions as F

# explicit escapes so the fixture is byte-deterministic in the source file
SAMPLES = [
    "école",        # e + combining acute -> école
    "café",          # already composed
    "Å",            # A + combining ring -> Å
    "plain ascii",
    "ṩ",             # s with dot below+above, NFC form
    "ṩ",      # same text, fully decomposed
]


def test_nfc_normalize_composes(spark):
    from kenlm_rs_spark.ops.normalize import nfc_normalize

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i long, s string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", nfc_normalize(F.col("s")).alias("n")).collect()
    }
    assert got[0] == "école"
    assert got[1] == "café"
    assert got[2] == "Å"
    assert got[3] == "plain ascii"
    assert got[5] == got[4] == "ṩ"


def test_nfc_normalize_duckdb_parity(spark):
    from kenlm_rs_spark.ops.normalize import nfc_normalize

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i long, s string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", nfc_normalize(F.col("s")).alias("n")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(SAMPLES)))
    want = dict(con.sql("SELECT i, nfc_normalize(s) FROM t").fetchall())
    assert got == want


def test_dedup_key_kernel_and_sql_twin_parity(spark):
    import duckdb

    from kenlm_rs_spark.ops.normalize import dedup_key_py, dedup_key_sql_expr

    cases = [
        "Héllo, WÖRLD!! Ça—va  déjà_vu 42",
        "plain text already",
        "  MIXED   Case\tAnd\nSpace  ",
        "números É ÀÇÈ ñoño",
        "",
    ]
    con = duckdb.connect()
    for s in cases:
        got = con.sql(
            f"SELECT {dedup_key_sql_expr('s')} AS k FROM (SELECT ? AS s)",
            params=[s],
        ).fetchone()[0]
        assert got == dedup_key_py(s), s


def test_dedup_key_spark_column(spark):
    from pyspark.sql import functions as F

    from kenlm_rs_spark.ops.normalize import dedup_key

    df = spark.createDataFrame(
        [(1, "Héllo, World!"), (2, "hello   world"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["k"] for r in df.select("doc_id", dedup_key(F.col("text")).alias("k")).collect()}
    assert got == {1: "hello world", 2: "hello world", 3: None}
