"""URL canonicalization / dedup / blocklist: Spark vs DuckDB byte parity
(shared pattern constants), dedup semantics, and the broadcast plan law."""

import duckdb
import pytest
from pyspark.sql import functions as F

TRICKY_URLS = [
    "HTTP://Example.COM:80/path/?utm_source=x&id=1#frag",
    "https://example.com:443/a/b/",
    "https://example.com",
    "http://sub.Example.org:8080/x?a=1&utm_campaign=z&b=2",
    "https://example.com/?fbclid=abc",
    "https://example.com/p?utm_a=1&utm_b=2",
    "http://example.com/p/",
    "https://www.news.co.uk/story?ref=tw&id=9#top",
    "ftp://Files.Example.net/pub/",
    "https://example.com:8443/q?gclid=1&x=2&mc_cid=3",
    # '?' first appears INSIDE the fragment (SPA route): there is no query,
    # and the fragment must not leak into the canonical URL (ADVICE r4)
    "https://host.example/page#a/b?c=1",
    "https://host.example/page?q=1#a/b?c=2",
]


def test_canonical_url_spark_duckdb_parity(spark):
    from kenlm_rs_spark.ops.urls import (
        canonical_url,
        canonical_url_sql_expr,
        registered_domain,
        registered_domain_sql_expr,
    )

    df = spark.createDataFrame([(i, u) for i, u in enumerate(TRICKY_URLS)], "i long, url string")
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
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(TRICKY_URLS)))
    want = {
        i: (c, d)
        for i, c, d in con.sql(
            f"SELECT i, {canonical_url_sql_expr('url')} AS c, "
            f"{registered_domain_sql_expr('url')} AS d FROM u"
        ).fetchall()
    }
    assert got == want


def test_canonical_url_specific_cases(spark):
    from kenlm_rs_spark.ops.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in TRICKY_URLS], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got[0] == "http://example.com/path?id=1"
    assert got[1] == "https://example.com/a/b"
    assert got[2] == "https://example.com/"
    assert got[3] == "http://sub.example.org:8080/x?a=1&b=2"
    assert got[4] == "https://example.com/"
    assert got[5] == "https://example.com/p"
    assert got[6] == "http://example.com/p"
    assert got[9] == "https://example.com:8443/q?x=2"
    assert got[10] == "https://host.example/page"
    assert got[11] == "https://host.example/page?q=1"


def test_registered_domain_psl(spark):
    """Public-suffix-aware registered domain (frozen PSL snapshot):
    *.co.uk keeps three labels, plain TLDs keep two, bare-suffix hosts
    fall through to naive; Spark and DuckDB render the same constants."""
    import duckdb as _dd

    from kenlm_rs_spark.ops.urls import (
        registered_domain,
        registered_domain_sql_expr,
    )

    urls = [
        "https://example.co.uk/x",
        "https://a.b.example.co.uk:8443/y?q=1",
        "https://WWW.Example.COM.AU/z",
        "https://shop.example.com/p",
        "https://co.uk/",
        "https://example.io/",
        "https://news.example.go.jp/a",
        "https://example.gov.uk/s",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: (r["naive"], r["psl"])
        for r in df.select(
            "i",
            registered_domain(F.col("url")).alias("naive"),
            registered_domain(F.col("url"), psl=True).alias("psl"),
        ).collect()
    }
    assert got[0] == ("co.uk", "example.co.uk")
    assert got[1] == ("co.uk", "example.co.uk")
    assert got[2] == ("com.au", "example.com.au")
    assert got[3] == ("example.com", "example.com")
    assert got[4] == ("co.uk", "co.uk")  # bare suffix: documented fallback
    assert got[5] == ("example.io", "example.io")
    assert got[6] == ("go.jp", "example.go.jp")
    assert got[7] == ("gov.uk", "example.gov.uk")
    con = _dd.connect()
    con.execute("CREATE TABLE u(i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    want = {
        i: (n, p)
        for i, n, p in con.sql(
            f"SELECT i, {registered_domain_sql_expr('url')} AS n, "
            f"{registered_domain_sql_expr('url', psl=True)} AS p FROM u"
        ).fetchall()
    }
    assert got == want


def test_registered_domain_psl_wildcard_exception_rules(spark):
    """Full PSL rule algebra (VERDICT r5 item 6): wildcard rules
    (*.kawasaki.jp, *.sch.uk, *.ck) keep TWO labels above the base,
    exception rules (!city.kawasaki.jp, !www.ck) are themselves the
    registered domain, 3-label explicit entries (k12.fl.us) beat their
    2-label parents (fl.us), and .jp prefecture suffixes hold. Spark and
    DuckDB render the identical constants."""
    import duckdb as _dd

    from kenlm_rs_spark.ops.urls import (
        registered_domain,
        registered_domain_sql_expr,
    )

    cases = [
        # wildcard *.kawasaki.jp: <anything>.kawasaki.jp is a public suffix
        ("https://blog.igawa.kawasaki.jp/p", "kawasaki.jp", "blog.igawa.kawasaki.jp"),
        ("https://a.blog.igawa.kawasaki.jp/p", "kawasaki.jp", "blog.igawa.kawasaki.jp"),
        # exception !city.kawasaki.jp: that name IS the registered domain
        ("https://city.kawasaki.jp/", "kawasaki.jp", "city.kawasaki.jp"),
        ("https://www.city.kawasaki.jp/", "kawasaki.jp", "city.kawasaki.jp"),
        # wildcard *.sch.uk: schools sit two labels above sch.uk
        ("https://school.lincs.sch.uk/x", "sch.uk", "school.lincs.sch.uk"),
        ("https://www.school.lincs.sch.uk/x", "sch.uk", "school.lincs.sch.uk"),
        # whole-TLD wildcard *.ck and its exception !www.ck
        ("https://shop.anything.ck/", "anything.ck", "shop.anything.ck"),
        ("https://www.ck/", "www.ck", "www.ck"),
        ("https://a.www.ck/", "www.ck", "www.ck"),
        # 3-label explicit k12.fl.us beats 2-label fl.us (longest wins)
        ("https://school.k12.fl.us/", "fl.us", "school.k12.fl.us"),
        ("https://example.fl.us/", "fl.us", "example.fl.us"),
        # .jp prefecture 2-label suffix
        ("https://city.chiba.jp/", "chiba.jp", "city.chiba.jp"),
        # unaffected plain host
        ("https://www.example.com/", "example.com", "example.com"),
    ]
    urls = [c[0] for c in cases]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    got = {
        r["i"]: (r["naive"], r["psl"])
        for r in df.select(
            "i",
            registered_domain(F.col("url")).alias("naive"),
            registered_domain(F.col("url"), psl=True).alias("psl"),
        ).collect()
    }
    for i, (_, naive, psl) in enumerate(cases):
        assert got[i] == (naive, psl), (i, cases[i], got[i])
    con = _dd.connect()
    con.execute("CREATE TABLE u(i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    want = {
        i: (n, p)
        for i, n, p in con.sql(
            f"SELECT i, {registered_domain_sql_expr('url')} AS n, "
            f"{registered_domain_sql_expr('url', psl=True)} AS p FROM u"
        ).fetchall()
    }
    assert got == want


def test_registered_domain_psl_extras(spark):
    """Deployment hook: the full dated PSL dump flows in as extra rules."""
    from kenlm_rs_spark.ops.urls import registered_domain

    df = spark.createDataFrame(
        [
            (0, "https://foo.example.nom.br/"),
            (1, "https://x.web.example.zm/"),
            (2, "https://keep.me.custom.test/"),
        ],
        "i long, url string",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i",
            registered_domain(
                F.col("url"),
                psl=True,
                extra_suffixes=("nom.br",),
                extra_wildcards=("zm",),
                extra_exceptions=("keep.me.custom.test",),
            ).alias("d"),
        ).collect()
    }
    assert got[0] == "example.nom.br"
    assert got[1] == "web.example.zm"
    assert got[2] == "keep.me.custom.test"


def test_url_dedup_first_wins(spark):
    from kenlm_rs_spark.ops.urls import url_dedup

    df = spark.createDataFrame(
        [
            (10, "http://A.com/x?utm_source=1"),
            (3, "http://a.com/x/"),
            (7, "http://a.com/x#frag"),
            (5, "http://a.com/y"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["is_canonical"] for r in url_dedup(df).collect()}
    assert got == {3: True, 7: False, 10: False, 5: True}


def test_url_dedup_plan_compiles_codegen(spark):
    """Regression for VERDICT r5 item 3: the url_dedup plan used to blow
    janino's method limit (the join keyed on the derived canon_url pushed
    an isnotnull(canon_url) constraint — with the entire canonicalization
    expression substituted in — down to the scan as one giant Filter) and
    silently fell back to interpreted execution.  With
    spark.sql.codegen.fallback=false a compile failure RAISES instead of
    falling back, so plain successful execution proves every stage of the
    plan whole-stage-compiles."""
    from kenlm_rs_spark.ops.urls import url_dedup

    rows = [(i, f"https://site{i % 7}.example.com/p/{i % 11}?utm_source=x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        out = url_dedup(df)
        assert out.count() == 100
        assert out.filter("is_canonical").count() == 77
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_blocklist_filter_broadcast_and_semantics(spark):
    from kenlm_rs_spark.ops.urls import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://spam.example.com/x"),
            (2, "https://ok.other.org/y"),
            (3, "http://Example.Com:80/z"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("Example.com",)], "domain string")
    out = blocklist_filter(docs, bl)
    got = {r["doc_id"]: r["blocked"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: True}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_url_pattern_filter_first_match_wins(spark):
    from kenlm_rs_spark.ops.urls import url_pattern_filter

    docs = spark.createDataFrame(
        [
            (1, "https://my-casino.example.com/?utm_source=x"),  # gambling before tracking
            (2, "https://ok.example.com/page?utm_campaign=z"),
            (3, "https://bit.ly/abc"),
            (4, "https://clean.example.com/a"),
            (5, "https://x.example.com/p#frag"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["block_reason"] for r in url_pattern_filter(docs).collect()}
    assert got == {
        1: "gambling",
        2: "tracking_query",
        3: "shortener",
        4: None,
        5: "fragment_nav",
    }
    plan = url_pattern_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_corpus_report_values(spark):
    from kenlm_rs_spark.ops.reports import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s1"),     # exact dup of 1
            (3, "d e", "en", "s1"),
            (4, "x", "de", "s2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {(r["lang"], r["source"]): r for r in corpus_report(docs).collect()}
    en = rows[("en", "s1")]
    assert en["n_docs"] == 3
    assert en["total_tokens"] == 8
    assert en["distinct_fingerprints"] == 2
    assert rows[("de", "s2")]["n_docs"] == 1
