"""Full-text retrieval (ops/search.py): inverted-index postings, smoothed
tf-idf top-k, and BM25 ranking — hand-computed goldens on a tiny corpus
plus the plan laws (query/df sides broadcast; no cartesian product)."""

import math

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.search import (
    bm25_search,
    doc_terms,
    inverted_index,
    tfidf_topk,
)

CORPUS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple cherry cherry date"),
    (3, "date"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_doc_terms_tf_and_dl(spark):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_terms(_docs(spark)).collect()
    }
    assert rows[(0, "apple")] == (2, 3)
    assert rows[(0, "banana")] == (1, 3)
    assert rows[(2, "cherry")] == (2, 4)
    assert rows[(3, "date")] == (1, 1)
    assert (1, "apple") not in rows


def test_inverted_index_postings_sorted(spark):
    idx = {
        r["term"]: (r["df"], [(p["doc_id"], p["tf"]) for p in r["postings"]])
        for r in inverted_index(_docs(spark)).collect()
    }
    assert idx["apple"] == (2, [(0, 2), (2, 1)])
    assert idx["cherry"] == (2, [(1, 1), (2, 2)])
    assert idx["date"] == (2, [(2, 1), (3, 1)])


def test_tfidf_topk_golden(spark):
    # N=4. idf(term) = ln((N+1)/(df+1)) + 1: apple/cherry/date df=2,
    # banana df=2 as well -> all idf equal; ranking reduces to tf then
    # term asc. doc0: apple tf=2 ranks first, banana second.
    out = tfidf_topk(_docs(spark), k=2)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in out.collect()
    }
    idf = math.log(5.0 / 3.0) + 1.0
    assert got[(0, 1)][0] == "apple"
    assert got[(0, 1)][1] == pytest.approx(round(2 * idf, 6), abs=1e-9)
    assert got[(0, 2)][0] == "banana"
    # doc2: cherry tf=2 first; apple vs date tie (tf=1, same idf) -> term asc
    assert got[(2, 1)][0] == "cherry"
    assert got[(2, 2)][0] == "apple"
    for dep in out.cached_deps:
        dep.unpersist()


def _bm25_weight(tf, dl, df, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    return round(idf * tfn, 9)


def test_bm25_golden_and_ranking(spark):
    qdf = spark.createDataFrame(
        [(0, "apple"), (1, "cherry date")], "query_id long, query string"
    )
    out = bm25_search(_docs(spark), qdf, k=4)
    rows = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in out.collect()
    }
    n, avgdl = 4, (3 + 2 + 4 + 1) / 4.0
    # query 0 'apple': doc0 (tf=2, dl=3) must outrank doc2 (tf=1, dl=4)
    w00 = _bm25_weight(2, 3, 2, n, avgdl)
    w02 = _bm25_weight(1, 4, 2, n, avgdl)
    assert rows[(0, 0)] == (pytest.approx(round(w00, 6), abs=1e-9), 1)
    assert rows[(0, 2)] == (pytest.approx(round(w02, 6), abs=1e-9), 2)
    assert (0, 1) not in rows and (0, 3) not in rows
    # query 1 'cherry date': doc2 matches both terms -> rank 1
    w12 = _bm25_weight(2, 4, 2, n, avgdl) + _bm25_weight(1, 4, 2, n, avgdl)
    assert rows[(1, 2)] == (pytest.approx(round(w12, 6), abs=1e-9), 1)
    assert set(k for k in rows if k[0] == 1) == {(1, 1), (1, 2), (1, 3)}
    for dep in out.cached_deps:
        dep.unpersist()


def test_bm25_k_truncates(spark):
    qdf = spark.createDataFrame([(9, "cherry date")], "query_id long, query string")
    out = bm25_search(_docs(spark), qdf, k=1)
    got = out.collect()
    assert len(got) == 1 and got[0]["doc_id"] == 2 and got[0]["rank"] == 1
    for dep in out.cached_deps:
        dep.unpersist()


def test_bm25_plan_laws(spark):
    """Query terms and document frequencies broadcast (the corpus side is
    never shuffled for the join); no cartesian product anywhere."""
    qdf = spark.createDataFrame([(0, "apple cherry")], "query_id long, query string")
    out = bm25_search(_docs(spark), qdf, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for dep in out.cached_deps:
        dep.unpersist()


def test_empty_query_terms_yield_no_rows(spark):
    qdf = spark.createDataFrame([(0, "   ")], "query_id long, query string")
    out = bm25_search(_docs(spark), qdf, k=3)
    assert out.count() == 0
    for dep in out.cached_deps:
        dep.unpersist()
