"""Incremental cross-snapshot dedup (ops/incremental_dedup.py): exact
is_new despite bloom false positives, no false negatives, totality, and
the negative-rows-skip-the-join law."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.incremental_dedup import incremental_dedup


@pytest.fixture(scope="module")
def halves(spark):
    seen = spark.createDataFrame(
        [(i, f"old-{i}") for i in range(100)], "doc_id long, key string"
    )
    # 30 duplicates of old keys + 70 genuinely new
    new = spark.createDataFrame(
        [(1000 + i, f"old-{i}") for i in range(30)]
        + [(2000 + i, f"new-{i}") for i in range(70)],
        "doc_id long, key string",
    )
    return seen, new


def test_is_new_exact(spark, halves):
    seen, new = halves
    out = incremental_dedup(new, seen, m_bits=1 << 12).collect()
    got = {r["doc_id"]: r["is_new"] for r in out}
    assert len(got) == 100
    assert all(not got[1000 + i] for i in range(30))  # dups flagged
    assert all(got[2000 + i] for i in range(70))      # new kept


def test_no_false_negatives(spark, halves):
    seen, new = halves
    out = incremental_dedup(new, seen, m_bits=1 << 12).collect()
    for r in out:
        if not r["is_new"]:
            assert r["bloom_maybe"]  # a dup can never be bloom-negative


def test_fp_repair_under_tiny_filter(spark, halves):
    # m_bits=64 forces heavy false positives; is_new must stay exact
    seen, new = halves
    out = incremental_dedup(new, seen, m_bits=64).collect()
    got = {r["doc_id"]: (r["bloom_maybe"], r["is_new"]) for r in out}
    assert sum(1 for m, _ in got.values() if m) > 70  # filter saturated
    assert all(not got[1000 + i][1] for i in range(30))
    assert all(got[2000 + i][1] for i in range(70))


def test_extra_columns_survive(spark, halves):
    seen, _ = halves
    new = spark.createDataFrame(
        [(1, "old-0", "payload")], "doc_id long, key string, text string"
    )
    row = incremental_dedup(new, seen, m_bits=1 << 12).collect()[0]
    assert row["text"] == "payload" and row["is_new"] is False
