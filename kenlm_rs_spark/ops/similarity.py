"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. The query set is broadcast
  (small); the corpus side streams — one scan, no shuffle until the
  per-query top-k aggregation. Dot products run JVM-side via
  F.aggregate/zip_with (whole-stage codegen), not Python.
- LSH-bucketed ANN: random-hyperplane signatures computed with a
  deterministic, engine-portable pseudo-random matrix h[j][d] = sin(j*D + d)
  (no RNG state to ship). Projections are quantized (rounded to 1e-9) before
  the sign test so a projection within an ulp of zero cannot flip a bucket
  bit between engines whose libm differs in the last place; beyond that the
  signatures are reproducible in any engine with sin. Buckets equal
  signatures; probing compares only bucket-mates — the scale path where the
  brute-force quadratic join is impossible.
- banded multi-table near-dup (embedding_near_dup_pairs): T independent
  tables of b planes each, same band structure as MinHash-LSH
  (ops/dedup.py:83). Bucket population falls geometrically with b (2^b
  buckets per table), so the within-bucket self-join stays bucket-local at
  any corpus size, while T tables restore recall
  (P[candidate] = 1 - (1 - (1-theta/pi)^b)^T).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------- Arrow kernels (r7)
#
# The interpreted higher-order-function fold (F.aggregate over zip_with) costs
# ~1 interpreted expression eval per array element per op — measured as the
# dominant cost of every embedding query (CLAUDE.md: Arrow pandas UDF 1.2 s vs
# zip_with chain 14.5 s for per-element array work; guide §4.2).  These NumPy
# kernels reproduce the fold BIT-EXACTLY: `acc += A[:, d] * B[:, d]` performs,
# per (row, d), one IEEE multiply in the COMMON INPUT TYPE (f32*f32 stays f32,
# anything-with-f64 widens — NumPy array-array promotion matches Spark's SQL
# numeric promotion) followed by one f64 add, in ascending dimension order —
# the identical operation sequence of the interpreted
# `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)`.
# All round()/compare/argmax logic STAYS JVM-side on the kernel outputs, so
# no Python/JVM rounding-parity question ever arises.


#: Query-count crossover for brute_force_topk: at or below this, the
#: interpreted broadcast-join scoring beats launching an Arrow stage
#: (measured on local[32]; the crossover is about per-row interpreted work
#: nq*dim vs fixed Arrow stage cost, so it is workload-shaped, not
#: core-count-shaped).
ARROW_MIN_QUERIES = int(os.environ.get("KENLM_ARROW_MIN_QUERIES", "64"))


def _stack(series: pd.Series) -> np.ndarray:
    """Series of fixed-length vectors -> (n, d) matrix, dtype preserved
    (list<float> arrives as float32 ndarrays, list<double> as float64)."""
    return np.array(list(series))


def _seq_dot_rows(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise sequential-fold dot product (see block comment above)."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def _cos_with_nulls(dot, den, out_len):
    """cosine = dot/den with NULL (not NaN) where den == 0.0 — the
    cosine_similarity_col zero-norm contract."""
    with np.errstate(divide="ignore", invalid="ignore"):
        out = dot / den
    mask = den == 0.0
    if mask.any():
        s = pd.Series(pd.array(out, dtype="Float64"))
        s[mask] = pd.NA
        return s
    return pd.Series(out)


def make_cosine_pairs_udf():
    """pandas UDF (a_vec, b_vec) -> cosine double, bit-equal to
    cosine_similarity_col (NULL on zero-norm side) but vectorized."""

    @F.pandas_udf("double")
    def cos_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A, B = _stack(a), _stack(b)
        dot = _seq_dot_rows(A, B)
        den = np.sqrt(_seq_dot_rows(A, A)) * np.sqrt(_seq_dot_rows(B, B))
        return _cos_with_nulls(dot, den, len(a))

    # guide §4.4: marked non-deterministic so the optimizer cannot duplicate
    # the (expensive) kernel below pushed/inferred filters — the function is
    # in fact deterministic; the marker only constrains plan rewrites
    return cos_pairs.asNondeterministic()


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


def make_matrix_cosines_udf(M, row_norms=None):
    """pandas UDF vec -> array<double>: cosine of the input vector against
    every row of the (model-sized, closure-shipped) matrix ``M``, each
    element the bit-exact sequential fold (NULL on a zero-norm side).
    Shared by mine_bitext, brute_force_topk and the centroid assignment."""
    Mnorm = np.sqrt(_seq_dot_rows(M, M)) if row_norms is None else row_norms
    # memory guard for large M (guide §5): the (rows x |M|) accumulator and
    # its per-dimension temporaries are bounded by processing the batch in
    # row chunks of <= ~4M matrix elements (~32 MB per temp) — rows are
    # independent, so chunking changes NOTHING about each row's arithmetic
    chunk_rows = max(1, 4_000_000 // max(1, M.shape[0]))

    @F.pandas_udf("array<double>")
    def mat_cos(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        Vfull = _stack(vecs)
        out: list = []
        for lo in range(0, Vfull.shape[0], chunk_rows):
            V = Vfull[lo : lo + chunk_rows]
            acc = np.zeros((V.shape[0], M.shape[0]), dtype=np.float64)
            for d in range(V.shape[1]):
                acc += V[:, d][:, None] * M[:, d][None, :]
            vnorm = np.sqrt(_seq_dot_rows(V, V))
            den = vnorm[:, None] * Mnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / den
            if (den == 0.0).any():
                mask = den == 0.0
                out.extend(
                    [None if m else float(x) for x, m in zip(row, mrow)]
                    for row, mrow in zip(cos, mask)
                )
            else:
                out.extend(list(cos))
        return pd.Series(out)

    # guide §4.4: see make_cosine_pairs_udf
    return mat_cos.asNondeterministic()


def make_centroid_cosines_udf(cents: list):
    """pandas UDF vec -> array<double> of cosines against every centroid of
    ``cents`` ([(cid, [float, ...]), ...] in cid order), each element
    bit-equal to cosine_similarity_col(vec, centroid-literal) (centroid
    literals are doubles; a float32 corpus vector widens exactly, matching
    the JVM's float*double promotion).  NULL elements where a norm is zero.
    round/argmax stay JVM-side (best_cluster_from_cosines)."""
    C = np.array([v for _, v in cents], dtype=np.float64)
    return make_matrix_cosines_udf(C)


def best_cluster_from_cosines(cos_arr, cids: list):
    """argmax cosine over a kernel-produced cosine array + the matching cid
    list: identical round-9/tie-to-smallest-cid logic as best_cluster_col,
    with the round and the struct max evaluated JVM-side."""
    ncids = F.array(*[F.lit(-int(c)).cast("long") for c in cids])
    return -F.array_max(
        F.zip_with(
            cos_arr,
            ncids,
            lambda c, n: F.struct(
                F.round(c, 9).alias("cos"), n.alias("ncid")
            ),
        )
    )["ncid"]


_PLANE_MATRIX_MEMO: dict = {}


def jvm_sin_plane_matrix(spark, dim: int, n_planes: int, plane_offsets):
    """(len(plane_offsets)*n_planes, dim) float64 matrix of the hyperplane
    components sin(d + (off + j)*dim) — computed BY THE JVM (one
    constant-folded collect) so each value is bit-identical to what the
    interpreted hyperplane_signature_col expression evaluates per row.
    Memoized per (dim, n_planes, offsets): pure algorithm constants, no
    input data involved."""
    key = (dim, n_planes, tuple(plane_offsets))
    hit = _PLANE_MATRIX_MEMO.get(key)
    if hit is not None:
        return hit
    args = [
        float(d + (off + j) * dim)
        for off in plane_offsets
        for j in range(n_planes)
        for d in range(dim)
    ]
    row = spark.range(1).select(
        F.array(*[F.sin(F.lit(a)) for a in args]).alias("h")
    ).collect()[0]["h"]
    H = np.array(row, dtype=np.float64).reshape(
        len(plane_offsets) * n_planes, dim
    )
    _PLANE_MATRIX_MEMO[key] = H
    return H


def make_projections_udf(H: np.ndarray):
    """pandas UDF vec -> array<double> of per-plane projections (H rows),
    each bit-equal to the interpreted zip_with/aggregate fold: the JVM
    widens a float vector element to double before multiplying by the
    (double) sin component, hence the explicit astype."""

    @F.pandas_udf("array<double>")
    def projs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = _stack(vecs).astype(np.float64, copy=False)
        acc = np.zeros((V.shape[0], H.shape[0]), dtype=np.float64)
        for d in range(V.shape[1]):
            acc += V[:, d][:, None] * H[:, d][None, :]
        return pd.Series(list(acc))

    # guide §4.4: see make_cosine_pairs_udf
    return projs.asNondeterministic()


def signature_from_projections(proj_col, n_planes: int, table_idx: int = 0):
    """Assemble the n_planes-bit signature from a projections array column
    (table_idx selects the plane block): identical round-9 sign test and
    bit weights as hyperplane_signature_col, evaluated JVM-side."""
    sig = F.lit(0)
    for j in range(n_planes):
        p = proj_col[table_idx * n_planes + j]
        sig = sig + F.when(F.round(p, 9) > 0, F.lit(1 << j)).otherwise(0)
    return sig


def cosine_similarity_col(a, b):
    """Cosine, NULL for a zero-norm side. A zero embedding (dead encoder
    output, all-padding doc) must not abort a 10-hour job: Spark 4's ANSI
    mode RAISES on the 0/0 division (measured), while DuckDB's twin
    expression yields NULL — by Cauchy-Schwarz a zero norm forces a zero
    dot, so null-on-zero-denominator reproduces DuckDB's 0/0 behavior
    exactly and downstream threshold/rank stages drop the row on both
    engines."""
    denom = _norm(a) * _norm(b)
    return F.when(denom != 0.0, _dot(a, b) / denom)


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query vector against the corpus.

    The query set was always driver-broadcast (small-queries x huge-corpus
    pattern); r7 collects it and picks the scoring path by MEASURED
    crossover (guide §1: measure, don't assume):
    - few queries (<= ARROW_MIN_QUERIES): the original broadcast join with
      the interpreted per-pair fold — per corpus row the interpreted cost
      is nq*dim*~3 expression evals, cheaper than launching an Arrow stage
      (measured 0.32 s vs 0.68 s at nq=5, 5k corpus rows; an unrolled
      codegen sum chain measured 5x WORSE than the HOF and was rejected);
    - many queries: ONE Arrow kernel emitting each corpus row's full
      query-cosine list (each corpus vector crosses the Python boundary
      once, not once per query; posexplode reproduces the exact pair set).
    Both paths are bit-identical (parity-tested)."""
    qid_type = query_df.schema[id_col].dataType
    q_type = query_df.schema[vec_col].dataType.elementType.simpleString()
    np_q = np.float32 if q_type == "float" else np.float64
    q_rows = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).collect()
    c = df.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec"))
    if not q_rows:  # empty query set -> empty result, like the join
        return c.select(
            F.lit(None).cast(qid_type).alias("query_id"),
            "match_id",
            F.lit(None).cast("double").alias("cosine"),
            F.lit(0).alias("rank"),
        ).filter(F.lit(False))
    if len(q_rows) <= ARROW_MIN_QUERIES:
        q = query_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
        scored = (
            c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
            .withColumn(
                "cosine", cosine_similarity_col(F.col("qvec"), F.col("cvec"))
            )
            .select("query_id", "match_id", "cosine")
        )
    else:
        Q = np.array([list(r["qvec"]) for r in q_rows], dtype=np_q)
        mat_cos = make_matrix_cosines_udf(Q)
        qid_arr = F.array(
            *[F.lit(r["query_id"]).cast(qid_type) for r in q_rows]
        )
        scored = (
            c.withColumn("_ca", mat_cos(F.col("cvec")))
            .select("match_id", F.posexplode("_ca").alias("_qi", "cosine"))
            .select(
                F.element_at(qid_arr, F.col("_qi") + 1).alias("query_id"),
                "match_id",
                "cosine",
            )
            .filter(F.col("query_id") != F.col("match_id"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def hyperplane_signature_col(vec, dim: int, n_planes: int = 8, plane_offset: int = 0):
    """Deterministic random-hyperplane LSH signature (int). Plane j has
    components sin((plane_offset + j)*dim + d) for d in [0, dim); the
    projection is rounded to 9 decimals before the sign test (cross-engine
    determinism — see module docstring)."""
    sig = F.lit(0)
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: F.sin(d + F.lit((plane_offset + j) * dim)),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(F.round(proj, 9) > 0, F.lit(1 << j)).otherwise(0)
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
    # r7 NOTE: an Arrow projections-kernel variant of this function was
    # built and MEASURED SLOWER at this shape (n_planes <= 8: ~1.0-1.3 s vs
    # 0.67 s interpreted on sf0.1 — two extra Arrow stage launches outweigh
    # the small per-row fold).  The kernel path remains the 100 TB move for
    # the heavy multi-table signatures (embedding_near_dup_pairs and
    # mine_bitext_lsh use it, T*b >= 32 planes); this few-plane path keeps
    # the interpreted expression.
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
    dim: int | None = None,
    n_tables: int = 4,
    planes_per_table: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded multi-table
    hyperplane LSH: T independent tables of b planes each (exactly the
    band structure of the MinHash path, ops/dedup.py:83); candidates are the
    union over tables of same-bucket pairs, deduped, then verified by exact
    cosine >= threshold.

    Scale shape (the 100 TB question): a SINGLE signature table of few planes
    gives only 2^planes buckets and an O(N^2 / 2^planes) all-pairs join — a
    constant-factor discount, not a scale path. Here each table has 2^b
    buckets (b=8..16+), so expected bucket population is N/2^b and the
    self-join cost is sum over buckets of |bucket|^2 — linear in N for fixed
    density — while recall for cosine >= c is
    1 - (1 - (1-theta(c)/pi)^b)^T, tunable by T without touching bucket size.
    The bucket join shuffles on (table, sig): uniform keys, no hot bucket.

    Callers in the hot path should always pass ``dim``; the ``dim is None``
    fallback does one driver-side ``first()`` as a convenience only."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    # r7: all T*b projections in ONE Arrow kernel pass per vector (the
    # dominant cost used to be T x b interpreted dim-element folds per row,
    # with the sin plane matrix re-evaluated per row on top); the round-9
    # sign tests and bit assembly stay JVM-side, bit-identical
    H = jvm_sin_plane_matrix(
        df.sparkSession, dim, planes_per_table,
        tuple(t * planes_per_table for t in range(n_tables)),
    )
    pudf = make_projections_udf(H)
    # one struct per table -> explode: each vector emits T (table, sig) rows
    sigs = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                signature_from_projections(
                    F.col("_pr"), planes_per_table, table_idx=t
                ).alias("sig"),
            )
            for t in range(n_tables)
        ]
    )
    # cached: the projections feed BOTH sides of the self-join, and Catalyst
    # does not reuse the subtree across them (.explain: 4 scans without the
    # cache)
    exploded = (
        base.withColumn("_pr", pudf(F.col("vec")))
        .withColumn("ts", F.explode(sigs))
        .select(
            "vid", "vec", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig")
        )
        .cache()
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        # a pair colliding in several tables must verify once, not T times
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos_pairs = make_cosine_pairs_udf()
    out = (
        cand.withColumn("cosine", cos_pairs(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    # unpersist handle for long-lived sessions (ADVICE r3): the cache must
    # outlive this lazy plan, so release is the caller's call
    out.cached_deps = [exploded]
    return out


def sampled_centroids(
    df: DataFrame,
    centroid_stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """The deterministic modulo-sampled coarse quantizer (id % stride == 0)
    as a collected [(cid, [float, ...]), ...] list in cid order. MODEL-sized
    collect (C ~ sqrt(N) by stride choice); shared by ivf_ann_topk,
    ops/semdedup.py and sampled_centroid_array."""
    cents = sorted(
        (r[0], list(r[1]))
        for r in df.filter((F.col(id_col) % centroid_stride) == 0)
        .select(id_col, vec_col)
        .collect()
    )
    if not cents:
        raise ValueError("centroid_stride sampled zero centroids")
    return cents


def sampled_centroid_array(
    df: DataFrame,
    centroid_stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Literal array<struct<cid,cvec>> of the sampled quantizer. float32
    parquet values are exactly representable as double literals, so both
    engines see identical centroid coordinates."""
    cents = sampled_centroids(df, centroid_stride, id_col, vec_col)
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
            )
            for cid, vec in cents
        ]
    )


def best_cluster_col(cent_arr, vec):
    """argmax cosine over the literal centroid array, tie -> smallest cid.

    ONE transform over the literal array (each element's cosine evaluated
    exactly once — building a separate cosine-array column would be
    re-inlined per lambda element by Catalyst, the O(C^2) pathology
    documented in CLAUDE.md); round(cos, 9) so a last-ulp libm difference
    cannot flip an assignment between engines."""
    return -F.array_max(
        F.transform(
            cent_arr,
            lambda c: F.struct(
                F.round(cosine_similarity_col(vec, c["cvec"]), 9).alias("cos"),
                (-c["cid"]).alias("ncid"),
            ),
        )
    )["ncid"]


def ivf_ann_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 5,
    centroid_stride: int = 37,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate NN: a coarse quantizer splits the corpus into
    inverted lists; each query scans only its n_probe nearest lists
    (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
    Search" SIV — here with Flat residuals, i.e. exact cosine inside the
    probed lists).

    The coarse quantizer is a deterministic modulo sample of the corpus
    (id % centroid_stride == 0) rather than k-means: sampled centroids are
    the standard k-means-free IVF baseline, and determinism lets the DuckDB
    oracle rebuild the identical structure. Assignment ties and probe ranks
    break on round(cos, 9) then smallest centroid id, mirroring the LSH
    sign-test quantization (hyperplane_signature_col) so a last-ulp libm
    difference cannot flip a list assignment between engines.

    Scale shape (100 TB): centroids are MODEL-sized (n_centroids ~ sqrt(N),
    picked by sampling ids at the right stride), collected once and inlined
    as a closure constant, so corpus->list assignment is a NARROW
    projection — ONE Arrow kernel pass per batch (r7: the interpreted
    O(C*d) per-row HOF fold was the measured dominant cost; the kernel
    computes the identical sequential-fold cosines vectorized and the
    round-9 argmax stays JVM-side, best_cluster_from_cosines). The probe
    table (|queries| x n_probe rows) is broadcast; the candidate join is a
    broadcast hash join on cluster id, so the corpus still never shuffles —
    only the candidate set (~ n_probe/n_centroids of the corpus) moves for
    the per-query top-k."""
    cents = sampled_centroids(df, centroid_stride, id_col, vec_col)
    cent_cos = make_centroid_cosines_udf(cents)

    corpus = df.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec")
    ).withColumn(
        "cluster",
        best_cluster_from_cosines(
            cent_cos(F.col("cvec")), [cid for cid, _ in cents]
        ),
    )

    # probe lists for the (tiny) query side via the centroid DataFrame —
    # broadcast cross join, |queries| x n_centroids rows
    cents_df = df.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("pvec")
    )
    qp = (
        query_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
        .crossJoin(F.broadcast(cents_df))
        .withColumn(
            "pcos",
            F.round(cosine_similarity_col(F.col("qvec"), F.col("pvec")), 9),
        )
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("cid"))
    probes = (
        qp.withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qvec", F.col("cid").alias("cluster"))
    )

    cos_pairs = make_cosine_pairs_udf()
    scored = (
        corpus.join(F.broadcast(probes), "cluster")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cos_pairs(F.col("qvec"), F.col("cvec")))
        .select("query_id", "match_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )
