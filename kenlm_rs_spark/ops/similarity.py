"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. The query set is broadcast
  (small); the corpus side streams — one scan, no shuffle until the
  per-query top-k aggregation. Dot products run JVM-side via
  F.aggregate/zip_with (whole-stage codegen), not Python.
- LSH-bucketed ANN: random-hyperplane signatures computed with a
  deterministic, engine-portable pseudo-random matrix h[j][d] = sin(j*D + d)
  (no RNG state to ship; identical in any engine with sin). Buckets equal
  signatures; probing compares only bucket-mates — the scale path where the
  brute-force quadratic join is impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query vector against the corpus.

    query_df is broadcast — at scale this is the classic
    small-queries x huge-corpus pattern: one corpus scan, map-side join,
    partial top-k per partition via the rank window after AQE coalescing."""
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = df.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("qvec"), F.col("cvec")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def hyperplane_signature_col(vec, dim: int, n_planes: int = 8):
    """Deterministic random-hyperplane LSH signature (int). Plane j has
    components sin(j*dim + d) for d in [0, dim)."""
    sig = F.lit(0)
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: F.sin(d + F.lit(j * dim)),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << j)).otherwise(0)
    return sig


def lsh_ann_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within matching LSH buckets.

    At 10^12 scale the bucket join shuffles on the signature (uniform),
    reducing candidate pairs by ~2^n_planes versus brute force."""
    sig = lambda v: hyperplane_signature_col(v, dim, n_planes)
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).withColumn("sig", sig(F.col("qvec")))
    c = df.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec")
    ).withColumn("sig", sig(F.col("cvec")))
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("qvec"), F.col("cvec")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from matching
    random-hyperplane buckets (high-cosine pairs land in the same bucket with
    probability (1 - theta/pi)^n_planes), verified by exact cosine >= threshold.
    The scale path for embedding dedup — candidate count is bucket-local."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sides = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("sig", hyperplane_signature_col(F.col("vec"), dim, n_planes))
    a, b = sides.alias("a"), sides.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .withColumn("cosine", cosine_similarity_col(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            "cosine",
        )
    )
    return pairs
