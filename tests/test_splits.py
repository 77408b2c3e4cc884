"""Domain-grouped holdout split (ops/splits.py): the leakage guard
(same domain => same split), PSL grouping, determinism across calls,
holdout-rate band over many domains, and validation."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.splits import domain_holdout_split


def _urls_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_same_domain_same_split_incl_psl(spark):
    rows = [
        (0, "https://news.example.co.uk/a"),
        (1, "https://blog.example.co.uk/b?x=1"),
        (2, "https://EXAMPLE.co.uk:443/c"),
        (3, "https://other.com/a"),
        (4, "https://www.other.com/b"),
    ]
    out = domain_holdout_split(_urls_df(spark, rows), salt="s").collect()
    by_domain = {}
    for r in out:
        by_domain.setdefault(r["domain"], set()).add((r["split"], r["bucket"]))
    # PSL keeps example.co.uk intact; all three subdomain/case/port
    # variants collapse to ONE domain with ONE split
    assert set(by_domain) == {"example.co.uk", "other.com"}
    assert all(len(v) == 1 for v in by_domain.values())


def test_deterministic_and_salt_sensitivity(spark):
    rows = [(i, f"https://site{i % 20}.org/p{i}") for i in range(100)]
    a = {r["doc_id"]: r["split"]
         for r in domain_holdout_split(_urls_df(spark, rows), salt="a").collect()}
    a2 = {r["doc_id"]: r["split"]
          for r in domain_holdout_split(_urls_df(spark, rows), salt="a").collect()}
    b = {r["doc_id"]: r["split"]
         for r in domain_holdout_split(
             _urls_df(spark, rows), salt="b", holdout_permille=500
         ).collect()}
    assert a == a2  # rerun-identical, no RNG state
    assert a != b   # a different salt is a different partition


def test_holdout_rate_band(spark):
    # 400 distinct domains at 250 permille: binomial(400, .25) — a wide
    # band that still catches an off-by-10x bucket bug
    rows = [(i, f"https://d{i}.net/x") for i in range(400)]
    out = domain_holdout_split(
        _urls_df(spark, rows), holdout_permille=250, salt="band"
    )
    frac = out.filter(F.col("split") == "holdout").count() / 400
    assert 0.15 < frac < 0.35
    assert out.filter(F.col("bucket") >= 1000).count() == 0
    assert out.filter(F.col("bucket") < 0).count() == 0


def test_validation(spark):
    df = _urls_df(spark, [(0, "https://a.com/x")])
    with pytest.raises(ValueError):
        domain_holdout_split(df, holdout_permille=1001)
    with pytest.raises(ValueError):
        domain_holdout_split(df, holdout_permille=-1)
