"""Property-based Spark<->DuckDB parity for URL canonicalization: the two
engines must produce byte-identical canonical URLs and registered domains
for ARBITRARY URL-ish inputs, not just the hand-picked battery in
test_urls.py. Hypothesis drives the generator; failures shrink to minimal
counterexamples."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SCHEMES = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", "Ftp"])
LABEL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1,
    max_size=8,
)
HOST = st.lists(LABEL, min_size=1, max_size=4).map(".".join)
PORT = st.sampled_from(["", ":80", ":443", ":8080", ":0443"])
PATHSEG = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._~%-", max_size=6
)
PATH = st.lists(PATHSEG, max_size=4).map(lambda segs: "".join("/" + s for s in segs))
PARAM = st.tuples(
    st.sampled_from(
        ["a", "id", "q", "utm_source", "utm_campaign", "fbclid", "gclid",
         "ref", "mc_cid", "UTM_SOURCE"]
    ),
    st.text(alphabet="abc123%-.", max_size=5),
).map(lambda kv: f"{kv[0]}={kv[1]}")
QUERY = st.lists(PARAM, max_size=4).map(
    lambda ps: ("?" + "&".join(ps)) if ps else ""
)
FRAG = st.sampled_from(["", "#frag", "#", "#a/b?c=1"])

URL = st.builds(
    lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
    SCHEMES, HOST, PORT, PATH, QUERY, FRAG,
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(URL, min_size=1, max_size=20, unique=True))
def test_canonicalize_parity_random_urls(_spark, urls):
    from kenlm_rs_spark.ops.urls import (
        canonical_url,
        canonical_url_sql_expr,
        registered_domain,
        registered_domain_sql_expr,
    )

    df = _spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: (r["c"], r["d"])
        for r in df.select(
            "i",
            canonical_url(F.col("url")).alias("c"),
            registered_domain(F.col("url")).alias("d"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE u(i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    want = {
        i: (c, d)
        for i, c, d in con.sql(
            f"SELECT i, {canonical_url_sql_expr('url')} AS c, "
            f"{registered_domain_sql_expr('url')} AS d FROM u"
        ).fetchall()
    }
    con.close()
    assert got == want
