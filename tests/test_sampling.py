"""Deterministic per-group sampling (ops/sampling.py): exact counts,
determinism, small-group totality, and windowed == two-phase equivalence
(including a forced-fallback path at tiny over_sample)."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.sampling import (
    deterministic_sample,
    deterministic_sample_two_phase,
)


@pytest.fixture(scope="module")
def groups(spark):
    rows = [(i, "big") for i in range(500)] + [(1000 + i, "tiny") for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_exact_k_and_small_group_totality(spark, groups):
    out = deterministic_sample(groups, k=10, group_cols=["lang"])
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {"big": 10, "tiny": 3}


def test_deterministic_across_runs(spark, groups):
    a = sorted(r["doc_id"] for r in deterministic_sample(groups, 10, ["lang"]).collect())
    b = sorted(r["doc_id"] for r in deterministic_sample(groups, 10, ["lang"]).collect())
    assert a == b
    c = sorted(r["doc_id"] for r in deterministic_sample(groups, 10, ["lang"], seed="other").collect())
    assert a != c  # a different seed selects a different sample


def test_two_phase_equals_windowed(spark, groups):
    w = sorted(map(tuple, deterministic_sample(groups, 12, ["lang"]).collect()))
    tp = sorted(map(tuple, deterministic_sample_two_phase(groups, 12, ["lang"]).collect()))
    assert w == tp


def test_two_phase_fallback_path(spark, groups):
    # over_sample so small the prefilter is guaranteed to undershoot some
    # group -> the per-group fallback must restore exact equivalence
    w = sorted(map(tuple, deterministic_sample(groups, 50, ["lang"]).collect()))
    tp = sorted(
        map(
            tuple,
            deterministic_sample_two_phase(
                groups, 50, ["lang"], over_sample=0.2
            ).collect(),
        )
    )
    assert w == tp
