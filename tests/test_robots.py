"""robots.txt parsing + longest-prefix-match filtering (ops/robots.py)."""


def test_parse_robots_groups_and_edges():
    from kenlm_rs_spark.ops.robots import parse_robots

    txt = "\n".join(
        [
            "User-agent: specialbot",
            "Disallow: /",
            "",
            "# a comment",
            "User-agent: googlebot",
            "User-agent: *",
            "Disallow:",          # empty: allow-all, no rule
            "Disallow: /tmp/*",   # wildcard: skipped, never fails
            "Allow: /public",
            "DISALLOW: /private",  # case-insensitive key
            "User-agent: latebot",
            "Disallow: /late",
        ]
    )
    assert parse_robots(txt) == [("/public", True), ("/private", False)]
    # exact agent beats the * group; consecutive agents share a group
    assert parse_robots(txt, agent="googlebot") == [
        ("/public", True),
        ("/private", False),
    ]
    assert parse_robots(txt, agent="specialbot") == [("/", False)]
    assert parse_robots(txt, agent="latebot") == [("/late", False)]
    assert parse_robots("", agent="*") == []
    assert parse_robots("garbage without colons") == []


def test_robots_filter_longest_prefix_tie(spark):
    from kenlm_rs_spark.ops.robots import robots_filter

    rules = spark.createDataFrame(
        [
            ("a.com", "/x", False),
            ("a.com", "/x/deep", True),   # longer -> wins over /x
            ("a.com", "/tie", True),      # same length as below
            ("a.com", "/tie", False),     # tie -> Allow wins
            ("b.com", "/", False),
        ],
        "domain string, path_prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/x/deep/page"),
            (2, "a.com", "/x/other"),
            (3, "a.com", "/tie/page"),
            (4, "a.com", "/unmatched"),
            (5, "b.com", "/anything"),
            (6, "c.com", "/no/rules/at/all"),
        ],
        "doc_id long, domain string, path string",
    )
    got = {
        r["doc_id"]: r["crawl_allowed"]
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: False, 6: True}

    plan = (
        robots_filter(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan  # rules are the broadcast side
