"""Margin-based bitext mining — aligning parallel documents across two
monolingual corpora by embedding similarity (Artetxe & Schwenk 2019,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings"; the CCMatrix / CCAligned / WikiMatrix recipe). For every
source document the score of a target candidate is its cosine divided by
the average cosine of BOTH documents' k-nearest neighbourhoods (the
"ratio" margin) — absolute cosine alone over-selects hub vectors whose
neighbourhood is uniformly close; the margin normalizes that density out.
A pair is mined when each side is the other's best-margin candidate
(mutual / "intersection" strategy) and the margin clears a threshold.

The reference engine has no cross-corpus alignment; this extends the
multilingual-pipeline surface next to language ID (pipeline/langid.py)
and temperature rebalancing (ops/mixing.py), which consume exactly the
parallel data this op mines.

Scale shape (100 TB): candidate generation is the pluggable stage, and
BOTH variants ship: `mine_bitext` is the exact baseline (block join with
the target snapshot broadcast — mirrors ops/similarity.brute_force_topk,
oracle-checkable), `mine_bitext_lsh` is the scale path (banded
multi-table hyperplane LSH bucket join, neither corpus broadcast, margin
statistics over the candidate lists exactly as the paper computes them
over FAISS ANN lists). Downstream of candidates everything is shared
(`_margin_select`) and uniform-key: two row_number windows partitioned
by src/tgt id, two k-row-per-id aggregates, a join-back on ids, and a
mutual-argmax join — no global sort, no skewed key (ids are unique).

Engine-exact floats (the repo's float discipline): cosines are
deterministic doubles (fixed-order fold over the array — bit-equal to
DuckDB's list_dot_product, proven by the cosine_topk gate row since r3);
neighbourhood means use the domain_prior pattern — each cosine round-6ed
and cast DECIMAL(38,9) BEFORE the sum so the aggregation is
order-independent, then ONE IEEE division per side and a fixed sequence
of IEEE ops for the margin — bit-equal across engines, so even the
argmax ranking needs no tolerance band.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import (
    jvm_sin_plane_matrix,
    make_cosine_pairs_udf,
    make_matrix_cosines_udf,
    make_projections_udf,
    signature_from_projections,
)


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mutual best-margin pairs between `src` and `tgt` embeddings, exact
    (brute-force candidates: every src x tgt pair scored, target side
    broadcast — the oracle-checkable baseline).

    Returns (src_id, tgt_id, cosine, margin) — one row per mined pair,
    margin >= threshold, each side the other's best-margin candidate
    within its k-NN list. `cosine`/`margin` are round-6 for output; the
    selection itself runs on the deterministic unrounded doubles.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("svec"))

    # r7: the target snapshot was ALREADY driver-collected for the broadcast
    # block join; ship the same model-sized matrix into ONE Arrow kernel and
    # emit each source row's full cosine list instead of scoring |src|x|tgt|
    # joined rows with the interpreted HOF fold (the measured dominant cost)
    # and shipping every target vector once per pair.  Each cosine is the
    # identical sequential fold; NULL-on-zero-norm preserved; posexplode
    # yields exactly the pair set of the former cross join.
    t_type = tgt.schema[vec_col].dataType.elementType.simpleString()
    np_t = np.float32 if t_type == "float" else np.float64
    tid_type = tgt.schema[id_col].dataType
    t_rows = tgt.select(
        F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("tvec")
    ).collect()
    if not t_rows:  # empty target snapshot -> empty pair set, like the join
        pairs = s.select(
            "src_id",
            F.lit(None).cast(tid_type).alias("tgt_id"),
            F.lit(None).cast("double").alias("cos"),
        ).filter(F.lit(False))
        return _margin_select(pairs, k, threshold)
    tgt_ids = [r["tgt_id"] for r in t_rows]
    T = np.array([list(r["tvec"]) for r in t_rows], dtype=np_t)
    # shared vec-vs-matrix kernel (row-chunked for bounded memory at large
    # |tgt|; asNondeterministic inside)
    cos_row = make_matrix_cosines_udf(T)

    tid_arr = F.array(*[F.lit(i).cast(tid_type) for i in tgt_ids])
    pairs = (
        s.withColumn("_ca", cos_row(F.col("svec")))
        .select("src_id", F.posexplode("_ca").alias("_ti", "cos"))
        .select(
            "src_id",
            F.element_at(tid_arr, F.col("_ti") + 1).alias("tgt_id"),
            "cos",
        )
    )
    return _margin_select(pairs, k, threshold)


def mine_bitext_lsh(
    src: DataFrame,
    tgt: DataFrame,
    dim: int,
    k: int = 4,
    threshold: float = 1.0,
    n_tables: int = 6,
    planes_per_table: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SCALE path: candidates from banded multi-table hyperplane LSH
    (the same deterministic plane matrix and band structure as
    ops/similarity.embedding_near_dup_pairs — both sides hash with
    identical planes, so parallel documents collide), margins computed
    over the candidate lists exactly as the paper computes them over
    FAISS ANN lists. Neither corpus is broadcast and there is no all-pairs
    join: the bucket join shuffles on uniform (table, sig) keys, every
    downstream stage is the shared `_margin_select` (uniform-id keys).

    Approximation contract: recall of the exact miner is bounded by the
    LSH collision probability (tunable via n_tables without touching
    bucket size); a pair mined here is always scored with the same
    engine-exact arithmetic as `mine_bitext`, but its margin denominator
    sees only candidate neighbours (the ANN-list mean — Artetxe & Schwenk
    §3.2 use exactly this approximation at scale)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # r7: projections via the Arrow kernel (one pass for all T*b planes; the
    # interpreted expression also re-evaluated the sin plane matrix per row),
    # sign tests/bit assembly JVM-side, candidate cosines via the pairwise
    # Arrow kernel — all bit-identical to the former HOF folds.
    H = jvm_sin_plane_matrix(
        src.sparkSession, dim, planes_per_table,
        tuple(t * planes_per_table for t in range(n_tables)),
    )
    pudf = make_projections_udf(H)

    def _sigs(df, idc, out_id, out_vec):
        sig_arr = F.array(
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
        return (
            df.select(F.col(idc).alias(out_id), F.col(vec_col).alias(out_vec))
            .withColumn("_pr", pudf(F.col(out_vec)))
            .withColumn("ts", F.explode(sig_arr))
            .select(out_id, out_vec, "ts.tbl", "ts.sig")
        )

    s = _sigs(src, id_col, "src_id", "svec")
    t = _sigs(tgt, id_col, "tgt_id", "tvec")
    cos_pairs = make_cosine_pairs_udf()
    cand = (
        s.join(t, ["tbl", "sig"])
        # a pair colliding in several tables is scored once, not T times
        .dropDuplicates(["src_id", "tgt_id"])
        .select(
            "src_id",
            "tgt_id",
            cos_pairs(F.col("svec"), F.col("tvec")).alias("cos"),
        )
    )
    return _margin_select(cand, k, threshold)


def _margin_select(pairs: DataFrame, k: int, threshold: float) -> DataFrame:
    """Shared post-candidate stages: per-side k-NN rank, decimal-exact
    neighbourhood means, ratio margin, mutual best-margin join, threshold.
    `pairs` is (src_id, tgt_id, cos)."""
    # explicit null order: a zero-norm embedding yields a NULL cosine
    # (ops/similarity.cosine_similarity_col) — rank it last on BOTH
    # engines rather than trusting their (coincidentally equal) defaults
    w_s = Window.partitionBy("src_id").orderBy(
        F.desc_nulls_last("cos"), "tgt_id"
    )
    w_t = Window.partitionBy("tgt_id").orderBy(
        F.desc_nulls_last("cos"), "src_id"
    )
    # r7 (two changes, measured together):
    # 1. `pairs` is cached — it feeds both rank branches, and Catalyst does
    #    not reuse the candidate-kernel subtree across DataFrame references
    #    (.explain showed it re-evaluated up to 24x pre-cache).
    # 2. The combined (rs <= k OR rt <= k) filter over one doubly-windowed
    #    table is split into per-side rank branches: a DISJUNCTION blocks
    #    Spark 4's WindowGroupLimit rewrite, so both windows fully sorted
    #    all |src| x |tgt| rows; with one row_number + its own rank filter
    #    per branch, the optimizer inserts map-side group limits and each
    #    shuffle carries ~k rows per id instead of the full pair table.
    #    Equivalence: every src has a rank-1 row, so nn_s/nn_t cover every
    #    id and the margin joins drop nothing; fwd consumed only rs<=k rows
    #    and bwd only rt<=k rows, which is exactly ranked_s / ranked_t.
    pairs = pairs.cache()
    ranked_s = (
        pairs.withColumn("rs", F.row_number().over(w_s))
        .filter(F.col("rs") <= k)
        .cache()
    )
    ranked_t = (
        pairs.withColumn("rt", F.row_number().over(w_t))
        .filter(F.col("rt") <= k)
        .cache()
    )

    cos_dec = F.round("cos", 6).cast("decimal(38,9)")
    nn_s = (
        ranked_s.groupBy("src_id")
        .agg(F.sum(cos_dec).alias("ssum"), F.count(F.lit(1)).alias("scnt"))
    )
    nn_t = (
        ranked_t.groupBy("tgt_id")
        .agg(F.sum(cos_dec).alias("tsum"), F.count(F.lit(1)).alias("tcnt"))
    )
    # the ratio margin is UNDEFINED when the pooled neighbourhood mean is
    # exactly zero (orthogonal/cancelling candidate cosines — found by the
    # Hypothesis parity test as an ANSI division-by-zero): NULL it out, rank
    # nulls last EXPLICITLY (Spark's desc and DuckDB's DESC default their
    # null order differently), and let the threshold filter drop it.
    denom = (
        F.col("ssum").cast("double") / F.col("scnt")
        + F.col("tsum").cast("double") / F.col("tcnt")
    ) / F.lit(2.0)
    def _margin_of(r):
        return (
            r.join(nn_s, "src_id")
            .join(nn_t, "tgt_id")
            .withColumn(
                "margin", F.when(denom != 0.0, F.col("cos") / denom)
            )
        )
    w_ms = Window.partitionBy("src_id").orderBy(
        F.desc_nulls_last("margin"), "tgt_id"
    )
    w_mt = Window.partitionBy("tgt_id").orderBy(
        F.desc_nulls_last("margin"), "src_id"
    )
    fwd = (
        _margin_of(ranked_s)
        .withColumn("mr", F.row_number().over(w_ms))
        .filter(F.col("mr") == 1)
        .select("src_id", "tgt_id", "cos", "margin")
    )
    bwd = (
        _margin_of(ranked_t)
        .withColumn("mr", F.row_number().over(w_mt))
        .filter(F.col("mr") == 1)
        .select("src_id", "tgt_id")
    )
    out = (
        fwd.join(bwd, ["src_id", "tgt_id"])
        .filter(F.col("margin") >= F.lit(float(threshold)))
        .select(
            "src_id",
            "tgt_id",
            F.round("cos", 6).alias("cosine"),
            F.round("margin", 6).alias("margin"),
        )
    )
    # unpersist handle for long-lived sessions (the repo's cached_deps
    # contract): the caches must outlive this lazy plan
    out.cached_deps = [pairs, ranked_s, ranked_t]
    return out


def mine_bitext_sql(
    src_sql: str,
    tgt_sql: str,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The DuckDB twin: identical cosine (list_dot_product fold order),
    identical round-6/DECIMAL(38,9) neighbourhood sums, identical IEEE
    margin sequence and window tie-breaks, rendered as SQL over
    `src_sql` / `tgt_sql` (table names or parenthesized subqueries)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return f"""
        WITH p AS (
          SELECT s.{id_col} AS src_id, t.{id_col} AS tgt_id,
                 list_dot_product(s.{vec_col}, t.{vec_col}) /
                 (sqrt(list_dot_product(s.{vec_col}, s.{vec_col})) *
                  sqrt(list_dot_product(t.{vec_col}, t.{vec_col}))) AS cos
          FROM {src_sql} s, {tgt_sql} t
        ), r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY src_id
                                    ORDER BY cos DESC NULLS LAST, tgt_id) AS rs,
                 row_number() OVER (PARTITION BY tgt_id
                                    ORDER BY cos DESC NULLS LAST, src_id) AS rt
          FROM p
        ), rk AS (
          SELECT * FROM r WHERE rs <= {k} OR rt <= {k}
        ), nns AS (
          SELECT src_id,
                 sum(CAST(round(cos, 6) AS DECIMAL(38,9))) AS ssum,
                 CAST(count(*) AS BIGINT) AS scnt
          FROM rk WHERE rs <= {k} GROUP BY src_id
        ), nnt AS (
          SELECT tgt_id,
                 sum(CAST(round(cos, 6) AS DECIMAL(38,9))) AS tsum,
                 CAST(count(*) AS BIGINT) AS tcnt
          FROM rk WHERE rt <= {k} GROUP BY tgt_id
        ), m AS (
          SELECT rk.*,
                 CASE WHEN ((CAST(nns.ssum AS DOUBLE) / nns.scnt +
                             CAST(nnt.tsum AS DOUBLE) / nnt.tcnt) / 2.0)
                           <> 0.0
                      THEN rk.cos /
                           ((CAST(nns.ssum AS DOUBLE) / nns.scnt +
                             CAST(nnt.tsum AS DOUBLE) / nnt.tcnt) / 2.0)
                 END AS margin
          FROM rk JOIN nns USING (src_id) JOIN nnt USING (tgt_id)
        ), fwd AS (
          SELECT src_id, tgt_id, cos, margin FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_id
                ORDER BY margin DESC NULLS LAST, tgt_id) AS mr
            FROM m WHERE rs <= {k}
          ) WHERE mr = 1
        ), bwd AS (
          SELECT src_id, tgt_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY tgt_id
                ORDER BY margin DESC NULLS LAST, src_id) AS mr
            FROM m WHERE rt <= {k}
          ) WHERE mr = 1
        )
        SELECT fwd.src_id, fwd.tgt_id,
               round(fwd.cos, 6) AS cosine, round(fwd.margin, 6) AS margin
        FROM fwd JOIN bwd USING (src_id, tgt_id)
        WHERE fwd.margin >= {float(threshold)!r}
    """
