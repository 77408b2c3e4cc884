"""Per-domain quality prior (ops/domain_prior.py): hand-checkable means,
PSL separation of .co.uk sites, broadcast join-back plan law."""

from pyspark.sql import functions as F

from kenlm_rs_spark.ops.domain_prior import domain_quality_prior


def _df(spark):
    rows = [
        (1, "https://a.example.com/x", "good words " * 30),
        (2, "https://b.example.com/y", "good words " * 30),
        (3, "https://shop.co.uk/z", "spam"),
        (4, "https://other.co.uk/w", "spam"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_grouping_and_mean(spark):
    out = domain_quality_prior(_df(spark)).collect()
    by_id = {r["doc_id"]: r for r in out}
    # a/b.example.com collapse into example.com; the two .co.uk hosts stay
    # SEPARATE registered domains under the PSL rule
    assert by_id[1]["domain"] == "example.com"
    assert by_id[1]["n_domain_docs"] == 2
    assert by_id[1]["domain_score"] == by_id[2]["domain_score"]
    assert by_id[3]["domain"] == "shop.co.uk"
    assert by_id[4]["domain"] == "other.co.uk"
    assert by_id[3]["n_domain_docs"] == 1
    # identical text -> identical per-domain means even across domains
    assert by_id[3]["domain_score"] == by_id[4]["domain_score"]


def test_join_back_is_broadcast(spark):
    plan = domain_quality_prior(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_every_doc_returned_once(spark):
    out = domain_quality_prior(_df(spark))
    assert out.count() == 4
    assert out.select("doc_id").distinct().count() == 4
    assert out.filter(F.col("domain_score").isNull()).count() == 0
