"""Classifier calibration report — score-bin vs empirical keep-rate, the
monitoring artifact that tells you when the distilled quality classifier
(pipeline/classifier.py) has drifted from the labels it was trained to
imitate. The CCNet §4.4 pattern trains a cheap linear model once and
runs it over every crawl forever; the failure mode is silent: the web
shifts (new boilerplate, new spam family), the frozen weights stay, and
keep decisions quietly degrade. Re-running the full teacher pipeline on
a sample and tabulating agreement per score bin is the standard check —
a healthy model shows keep-rate rising monotonically with score and
near-0/near-1 rates in the extreme bins; drift shows up as a flattened
or folded curve long before corpus-level keep-rates move. Pairs with
`ops/drift.py` (feature drift) the way precision pairs with volume.

Scale shape (100 TB): ONE groupBy on the bin key (n_bins rows out,
uniform by construction); scores and labels are the existing codegen
expressions, so the whole report adds a single low-cardinality shuffle
to a scan the monitoring job already does — and it runs on a sample
(`pipeline/quality.resample_u_col`) when the teacher label is expensive.

Engine-exactness: the bin is a SHARED SQL expression (least/greatest/
floor over the round-6 score — both engines execute the identical text,
so identical doubles bin identically); counts are BIGINTs; mean score
sums DECIMAL(38,6)-exact (round-6 scores are exact at scale 6) and the
two rates each spend ONE IEEE division before round-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_bin_sql_expr(
    score_expr: str, lo: float, width: float, n_bins: int
) -> str:
    """Clamped fixed-width bin of ``score_expr`` — ANSI subset both Spark
    and DuckDB execute verbatim (shared source with the Spark plan)."""
    return (
        f"least({int(n_bins) - 1}, greatest(0, "
        f"CAST(floor(({score_expr} - ({lo!r})) / {width!r}) AS BIGINT)))"
    )


def calibration_report(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    lo: float = -10.0,
    width: float = 2.0,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, bin_lo, n, n_keep, keep_rate, mean_score) — one row per
    non-empty score bin; ``label_col`` is the teacher keep decision
    (boolean), ``score_col`` the student's round-6 score."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if width <= 0:
        raise ValueError(f"width must be > 0, got {width}")
    b = F.expr(calibration_bin_sql_expr(score_col, lo, width, n_bins))
    return (
        df.select(
            b.alias("bin"),
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_l"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_l").cast("long").alias("n_keep"),
            F.sum(F.col("_s").cast("decimal(38,6)")).alias("_ssum"),
        )
        .select(
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(float(width))).alias(
                "bin_lo"
            ),
            "n",
            "n_keep",
            F.round(
                F.col("n_keep").cast("double") / F.col("n"), 6
            ).alias("keep_rate"),
            F.round(
                F.col("_ssum").cast("double") / F.col("n"), 6
            ).alias("mean_score"),
        )
    )
