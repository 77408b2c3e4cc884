"""SemDeDup (ops/semdedup.py): planted duplicate removal, keep-lowest-id,
chain (greedy) behavior, totality, and determinism."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.semdedup import semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    # ids 0 and 37 are centroids (stride 37). Plant: 5 == 3 (exact dup),
    # 9 near 3 (cos ~ 0.999), 20 orthogonal-ish to everything.
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.0447, 0.0, 0.0]
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0]),
        (37, [0.0, 0.0, 1.0, 1.0]),
        (3, base),
        (5, base),
        (9, near),
        (20, [0.0, 0.0, 0.0, 1.0]),
    ]
    return _vecs(spark, rows)


def test_planted_duplicates_removed(spark, corpus):
    out = {r["vec_id"]: r for r in semdedup(corpus, threshold=0.95).collect()}
    assert len(out) == 6  # total: every vector gets a row
    assert out[3]["is_kept"] and out[3]["dup_of"] is None
    assert not out[5]["is_kept"] and out[5]["dup_of"] == 3
    assert not out[9]["is_kept"] and out[9]["dup_of"] == 3
    assert out[20]["is_kept"]


def test_cross_cluster_dups_not_seen(spark):
    # a near-dup pair straddling the cluster boundary is NOT compared —
    # the documented SemDeDup blocking tradeoff (cos(1, 38) ~ 0.9997 but
    # vec 1 joins centroid 0's cluster and vec 38 joins centroid 37's)
    rows = [
        (0, [1.0, 0.0]),
        (37, [0.0, 1.0]),
        (1, [0.72, 0.7]),
        (38, [0.7, 0.72]),
    ]
    out = {r["vec_id"]: r for r in semdedup(_vecs(spark, rows), 0.99).collect()}
    assert out[1]["cluster"] == 0 and out[38]["cluster"] == 37
    assert out[1]["is_kept"] and out[38]["is_kept"]


def test_threshold_boundary(spark, corpus):
    # at threshold above the near-dup cosine, only the exact dup goes
    out = {r["vec_id"]: r for r in semdedup(corpus, threshold=0.9999).collect()}
    assert not out[5]["is_kept"]
    assert out[9]["is_kept"]


def test_deterministic(spark, corpus):
    a = sorted(map(tuple, semdedup(corpus, 0.95).collect()))
    b = sorted(map(tuple, semdedup(corpus, 0.95).collect()))
    assert a == b


def test_hot_cluster_cap_bounds_candidates(spark):
    """VERDICT r5 item 5: a mass-duplicated template (every vector in ONE
    cluster, all near-identical) must not make the self-join O(|c|^2).
    With max_candidates=k the comparison side holds exactly min(k, |c|)
    rows per cluster, and on this degenerate fixture the capped result is
    EXACT (every later vector matches the cluster's min id, which is
    always inside the candidate prefix)."""
    from kenlm_rs_spark.ops.semdedup import cluster_candidates
    from kenlm_rs_spark.ops.similarity import (
        best_cluster_col,
        sampled_centroid_array,
    )

    n, k = 60, 4
    rows = [(i, [1.0, float(i) * 1e-9]) for i in range(n)]
    corpus = _vecs(spark, rows)

    cent = sampled_centroid_array(corpus, 37, "vec_id", "embedding")
    assigned = corpus.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("vec")
    ).withColumn("cluster", best_cluster_col(cent, F.col("vec")))
    per_cluster = (
        cluster_candidates(assigned, k)
        .groupBy("b_cluster")
        .count()
        .collect()
    )
    assert per_cluster and all(r["count"] <= k for r in per_cluster)

    capped = sorted(
        map(tuple, semdedup(corpus, 0.95, max_candidates=k).collect())
    )
    exact = sorted(map(tuple, semdedup(corpus, 0.95).collect()))
    assert capped == exact
    kept = [t for t in capped if t[3]]
    assert len(kept) == 1 and kept[0][0] == 0  # min id survives


def test_cap_large_enough_matches_exact(spark, corpus):
    got = sorted(
        map(tuple, semdedup(corpus, 0.95, max_candidates=100).collect())
    )
    want = sorted(map(tuple, semdedup(corpus, 0.95).collect()))
    assert got == want


def test_cap_validation(spark, corpus):
    with pytest.raises(ValueError):
        semdedup(corpus, 0.95, max_candidates=0).collect()
