"""Link-graph ops (ops/graph.py): href extraction edge cases, degree
stats, and PageRank against a hand-computed power iteration."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.graph import degree_stats, extract_links, pagerank


def test_extract_links_quote_forms_and_order(spark):
    html = (
        "<a href=\"https://a.example/x\">one</a> "
        "<link rel='css' href='/s.css'> "
        "<area href=\"#frag\"> <p>no href here</p> "
        "<a data-href=\"https://decoy.example\">decoy</a>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    got = [(r["pos"], r["href"]) for r in extract_links(df).orderBy("pos").collect()]
    # data-href matches the attribute-suffix form too (href=) — document the
    # contract: any *href= attribute is harvested; canonicalization filters.
    assert got[0] == (0, "https://a.example/x")
    assert got[1] == (1, "/s.css")
    assert got[2] == (2, "#frag")


def test_extract_links_binary_and_empty(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b'<a href="https://b.example/">x</a>')), (1, bytearray(b"<p>none</p>"))],
        "doc_id long, html binary",
    )
    got = {(r["doc_id"], r["href"]) for r in extract_links(df).collect()}
    assert got == {(0, "https://b.example/")}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_degree_stats(spark):
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 0), (0, 1)])  # dup edge
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(e).collect()}
    assert got == {0: (2, 1), 1: (1, 1), 2: (1, 2)}


def _naive_pagerank(edges, n_iter, damping=0.85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        agg = {v: 0.0 for v in nodes}
        for s, d in edges:
            agg[d] += round(rank[s] / out[s], 9)
        rank = {
            v: round((1.0 - damping) / n + damping * round(agg[v], 9), 9)
            for v in nodes
        }
    return rank


def test_pagerank_matches_naive(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (0, 2)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, edges), n_iter=4).collect()
    }
    want = _naive_pagerank(edges, 4)
    assert set(got) == set(want)
    for v in want:
        # the naive twin sums floats then rounds; the decimal sum differs
        # by at most one 1e-9 step per iteration
        assert got[v] == pytest.approx(want[v], abs=5e-9)


def test_pagerank_hub_outranks_leaves(spark):
    # star: every leaf -> hub 0, hub -> leaf 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, edges), n_iter=5).collect()
    }
    assert got[0] == max(got.values())
    assert all(got[0] > got[v] for v in range(2, 6))


def test_pagerank_zero_iters_is_uniform(spark):
    e = _edges(spark, [(0, 1), (1, 0)])
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=0).collect()}
    assert got == {0: 0.5, 1: 0.5}


def test_pagerank_dangling_mass_drops(spark):
    # 1 has no out-links: its mass vanishes (documented simplification)
    e = _edges(spark, [(0, 1)])
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=2).collect()}
    assert sum(got.values()) < 1.0
    assert got[1] > got[0]


def test_pagerank_redistribute_matches_naive(spark):
    # node 2 is dangling; replicate the engine arithmetic exactly:
    # ds = round(sum of dangling ranks / n, 9) folded as d * (contrib + ds)
    edges = [(0, 1), (1, 2), (3, 0)]
    n_iter, d = 3, 0.85
    nodes = {0, 1, 2, 3}
    n = len(nodes)
    out: dict[int, int] = {}
    for s, _t in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        agg = {v: 0.0 for v in nodes}
        for s, t in edges:
            agg[t] += round(rank[s] / out[s], 9)
        ds = round(sum(rank[v] for v in nodes if v not in out) / n, 9)
        rank = {
            v: round((1.0 - d) / n + d * (round(agg[v], 9) + ds), 9)
            for v in nodes
        }
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, edges), n_iter=n_iter, dangling="redistribute"
        ).collect()
    }
    assert set(got) == nodes
    for v in rank:
        assert got[v] == pytest.approx(rank[v], abs=5e-9)
    # mass is conserved up to round-9 truncation per node per iteration
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-7)


def test_pagerank_redistribute_no_dangling_equals_drop(spark):
    # with no out-degree-0 nodes ds == 0.0 and both variants agree exactly
    edges = [(0, 1), (1, 2), (2, 0)]
    drop = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, edges), n_iter=3).collect()
    }
    redis = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, edges), n_iter=3, dangling="redistribute"
        ).collect()
    }
    assert drop == redis


def test_pagerank_dangling_validation(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="dangling"):
        pagerank(e, n_iter=1, dangling="teleport")


def test_pagerank_plan_no_cartesian(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    out = pagerank(e, n_iter=2, checkpoint=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for dep in out.cached_deps:
        dep.unpersist()
    # the redistribute scalar must broadcast, never a cartesian product
    out2 = pagerank(e, n_iter=2, checkpoint=False, dangling="redistribute")
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    for dep in out2.cached_deps:
        dep.unpersist()


def test_extract_anchors_edge_cases(spark):
    from kenlm_rs_spark.ops.graph import extract_anchors

    html = (
        '<a href="https://a.com/">A Site</a>'
        "<a class='x' href='/rel' rel=nofollow>rel page</a>"
        '<a href="https://b.com/"></a>'          # empty anchor text kept
        '<a href="https://c.com/">has <b>markup</b></a>'  # stops at '<' -> no match
        '<link href="/css/x.css">'               # not an <a> -> no match
    )
    rows = (
        extract_anchors(
            spark.createDataFrame([(1, html)], "doc_id long, html string")
        )
        .orderBy("pos")
        .collect()
    )
    assert [(r["href"], r["anchor"]) for r in rows] == [
        ("https://a.com/", "A Site"),
        ("/rel", "rel page"),
        ("https://b.com/", ""),
    ]


def test_anchor_topk_rank_and_tiebreak(spark):
    from kenlm_rs_spark.ops.graph import anchor_text_topk

    rows = (
        [(i, "/t", "big") for i in range(5)]
        + [(i, "/t", "mid") for i in range(3)]
        + [(i, "/t", "also-mid") for i in range(3)]
        + [(0, "/t", "small")]
    )
    df = spark.createDataFrame(rows, "doc_id long, href string, anchor string")
    got = [
        (r["anchor"], r["n"], r["rnk"])
        for r in anchor_text_topk(df, k=2).orderBy("rnk").collect()
    ]
    # tie at n=3 broken on anchor asc: 'also-mid' beats 'mid'; k=2 drops both others
    assert got == [("big", 5, 1), ("also-mid", 3, 2)]


def test_pagerank_local_matches_distributed(spark, monkeypatch):
    """The hybrid driver-side twin must be BIT-equal to the distributed
    iteration (every round/decimal/double op mirrored), on a graph with
    hubs, chains, dangling nodes and uneven out-degrees, for both
    dangling modes."""
    import kenlm_rs_spark.ops.graph as G

    edges = (
        [(i, (i * 7 + 3) % 23) for i in range(23)]
        + [(i, (i * 5 + 11) % 23) for i in range(23)]
        + [(i, i - i % 4) for i in range(23)]
    )
    e = spark.createDataFrame(edges, "src long, dst long").filter(
        (F.col("src") % 9) != 4  # real dangling nodes
    )
    for mode in ("drop", "redistribute"):
        monkeypatch.setattr(G, "PAGERANK_LOCAL_MAX_EDGES", 10**6)
        local = {
            r["node"]: r["rank"]
            for r in G.pagerank(e, n_iter=5, dangling=mode).collect()
        }
        monkeypatch.setattr(G, "PAGERANK_LOCAL_MAX_EDGES", 0)
        dist = G.pagerank(e, n_iter=5, dangling=mode)
        got = {r["node"]: r["rank"] for r in dist.collect()}
        for d in getattr(dist, "cached_deps", []):
            d.unpersist()
        assert local == got, f"bit mismatch in mode={mode}"
