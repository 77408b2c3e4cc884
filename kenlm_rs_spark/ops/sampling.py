"""Deterministic per-group sampling: exactly min(k, |group|) rows per
group, selected by salted-md5 rank.

The pipeline uses: eval/holdout carve-outs, per-language human-review
probes, calibration sets for the distilled classifier
(tools/train_quality_classifier.py) — anywhere a sample must be
REPRODUCIBLE across re-runs, backfills, and engines (no rand(); the
repo-wide md5-keyed determinism of pipeline/quality.bucket_resample,
which samples by RATE — this op samples by exact COUNT).

Scale shape (100 TB): the windowed form sorts within each group — fine
while groups ≪ corpus (per-language sampling: the window partitions are
per-language and Spark spills sorts). For a near-corpus-sized group, the
two-phase form first prefilters by an md5 threshold fitted from the
group counts (one tiny agg + broadcast back, the
ops/mixing.token_budget_mix_two_phase shape) so the exact window runs
over ~over_sample*k survivors per group, never the full group; the
md5-rank selection is IDENTICAL to the windowed form whenever the
prefilter keeps >= k rows (guaranteed-equivalence pytest), and the
implementation verifies the bound and falls back per-group if a
pathological hash cluster undershoots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_key(id_col: str, seed: str):
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))


def deterministic_sample(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group by (md5, id) rank; returns
    the input columns plus ``rnk`` (1-based within group)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(
        _rank_key(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def deterministic_sample_two_phase(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    id_col: str = "doc_id",
    seed: str = "sample",
    over_sample: float = 4.0,
) -> DataFrame:
    """Same selection as ``deterministic_sample`` without sorting whole
    groups: per-group md5-threshold prefilter (keep ~over_sample*k by
    hash position), then the exact window over survivors only. Groups
    whose prefilter kept fewer than min(k, n) rows (vanishingly rare at
    over_sample=4: P ~ exp(-9k/8) by Chernoff) are re-run unfiltered."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = _rank_key(id_col, seed)
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("_n"))
    # md5 is uniform on [0, 16^4) in its first 4 hex digits; keep hashes
    # below frac * 16^4 (frac capped at 1 → whole group kept)
    frac = F.least(
        F.lit(1.0), F.lit(float(over_sample * k)) / F.col("_n").cast("double")
    )
    keyed = df.join(F.broadcast(counts), group_cols).withColumn(
        "_hpos", F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
    )
    pref = keyed.filter(F.col("_hpos") < frac * F.lit(65536.0))
    w = Window.partitionBy(*group_cols).orderBy(key, F.col(id_col))
    sampled = (
        pref.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
    # verification: a group is short only if the prefilter lost rank-k rows
    # (kept < min(k, n)). Derive shortness from the COUNTS table, not from
    # the sampled rows — a group the prefilter emptied entirely has no
    # sampled row at all and must still be re-run.
    got = sampled.groupBy(*group_cols).agg(F.count("*").alias("_got"))
    short = (
        counts.join(got, group_cols, "left")
        .filter(
            F.coalesce(F.col("_got"), F.lit(0))
            < F.least(F.lit(k), F.col("_n"))
        )
        .select(*group_cols)
    )
    ok = sampled.join(short, group_cols, "left_anti").select(*df.columns, "rnk")
    redo = (
        df.join(F.broadcast(short), group_cols)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(*df.columns, "rnk")
    )
    return ok.unionByName(redo)
