"""Property-based Spark<->DuckDB byte parity for the PII/toxicity scrub
chain: the two engines must produce identical scrubbed text for arbitrary
text with embedded emails/phones/IPs/SSNs/CCs/toxic words, not just the
synthetic corpus the pii_scrub oracle covers."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORD = st.text(alphabet="abcdefghij xyz.,!-", min_size=0, max_size=12)
EMAIL = st.builds(
    lambda a, b: f"{a}@{b}.com",
    st.text(alphabet="ab.c_%+-1", min_size=1, max_size=8),
    st.text(alphabet="abc-", min_size=1, max_size=6),
)
PHONE = st.builds(
    lambda a, b, c: f"+{a} {b}-{c}-1234",
    st.integers(1, 99),
    st.integers(100, 999),
    st.integers(100, 999),
)
IP = st.builds(
    lambda a, b: f"{a}.{b}.0.255",
    st.integers(0, 999),
    st.integers(0, 255),
)
SSN = st.builds(lambda a: f"{a:03d}-12-3456", st.integers(0, 999))
TOXIC = st.sampled_from(["badword1", "badword2", "slurword", "toxicterm", "notbadword1x"])
PIECE = st.one_of(WORD, EMAIL, PHONE, IP, SSN, TOXIC)
TEXT = st.lists(PIECE, max_size=12).map(" ".join)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(TEXT, min_size=1, max_size=20))
def test_scrub_parity_random_text(spark, texts):
    from kenlm_rs_spark.pipeline.scrub import scrub_sql_expr, scrub_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select("i", scrub_text(F.col("t")).alias("s")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE x(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO x VALUES (?, ?)", list(enumerate(texts)))
    want = dict(con.sql(f"SELECT i, {scrub_sql_expr('t')} FROM x").fetchall())
    con.close()
    assert got == want
