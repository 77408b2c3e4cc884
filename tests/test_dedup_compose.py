"""Composed dedup paths: LSH blocking + exact verify, and the banded
multi-table embedding near-dup (VERDICT r01 items 3 and 9).

These assert the 100x-relevant properties, not just row counts:
- blocked verify returns a SUBSET of the exact quadratic result, with
  identical jaccard values on shared pairs;
- banded LSH candidate count is bounded by bucket population (sum of
  C(|bucket|,2) over (table, sig) buckets), far below N^2/2.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    p = os.path.join(SF, "documents.parquet")
    if not os.path.exists(p):
        pytest.skip("documents fixture missing")
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def emb(spark):
    p = os.path.join(SF, "embeddings.parquet")
    if not os.path.exists(p):
        pytest.skip("embeddings fixture missing")
    return spark.read.parquet(p)


def test_lsh_jaccard_subset_of_exact(docs):
    from kenlm_rs_spark.ops.dedup import lsh_jaccard_dedup, ngram_jaccard_pairs

    kw = dict(shingle_n=3, threshold=0.12)
    exact = {
        (r["id_a"], r["id_b"]): (r["common"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(docs, **kw).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): (r["common"], round(r["jaccard"], 9))
        for r in lsh_jaccard_dedup(docs, num_hashes=8, bands=4, **kw).collect()
    }
    assert blocked, "LSH blocking found no pairs at all"
    for pair, vals in blocked.items():
        assert pair in exact, f"blocked pair {pair} not in exact result"
        assert vals == exact[pair], f"values differ for {pair}"
    # recall of the banded blocking on this fixture (informative floor; exact
    # dups always collide, so this can't be 0)
    assert len(blocked) >= max(1, len(exact) // 4)


def test_banded_lsh_candidates_bounded_by_buckets(emb):
    from kenlm_rs_spark.ops.similarity import (
        embedding_near_dup_pairs,
        hyperplane_signature_col,
    )

    n = emb.count()
    n_tables, b = 4, 8
    # bucket populations per (table, sig)
    sigs = emb.select(
        *[
            hyperplane_signature_col(
                F.col("embedding"), 64, b, plane_offset=t * b
            ).alias(f"sig{t}")
            for t in range(n_tables)
        ]
    )
    bucket_pairs = 0
    for t in range(n_tables):
        rows = sigs.groupBy(f"sig{t}").count().collect()
        bucket_pairs += sum(r["count"] * (r["count"] - 1) // 2 for r in rows)
    all_pairs = n * (n - 1) // 2
    # the candidate join is bucket-local: its size is exactly bucket_pairs
    # (pre-dedup); it must be far below the quadratic all-pairs join
    assert bucket_pairs < all_pairs / 2, (bucket_pairs, all_pairs)

    pairs = embedding_near_dup_pairs(
        emb, threshold=0.25, dim=64, n_tables=n_tables, planes_per_table=b
    )
    got = pairs.count()
    assert got <= bucket_pairs
    # verified pairs all clear the threshold
    assert pairs.filter(F.col("cosine") < 0.25).count() == 0


def test_banded_lsh_no_cartesian(emb):
    from kenlm_rs_spark.ops.similarity import embedding_near_dup_pairs

    plan = embedding_near_dup_pairs(
        emb, threshold=0.25, dim=64, n_tables=2, planes_per_table=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zero_norm_embedding_does_not_abort(spark):
    """A zero embedding (dead encoder output) must not kill the job under
    Spark 4 ANSI mode: the cosine kernel yields NULL (matching DuckDB's
    0/0) and threshold/rank stages drop the row on both engines."""
    from pyspark.sql import functions as F

    from kenlm_rs_spark.ops.similarity import (
        brute_force_topk,
        cosine_similarity_col,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 0.0]),   # zero vector — ANSI divide-by-zero before the fix
        (2, [0.8, 0.6]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = df.select(
        "vec_id",
        cosine_similarity_col(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0))).alias("c"),
    ).collect()
    vals = {r["vec_id"]: r["c"] for r in got}
    assert vals[1] is None and vals[0] == 1.0
    # end-to-end: the zero vector ranks strictly after every real
    # neighbour (null cosine sorts last) and never wins a top-1
    top1 = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=1).collect()
    assert [r["match_id"] for r in top1] == [2]
