"""Distribution-drift monitoring between crawl snapshots — the PSI
(Population Stability Index) over a quality feature's histogram, the
standard production-ML drift statistic. At crawl cadence a 100 TB
pipeline re-runs the same filter over each new snapshot; a quality
regression (template spam wave, extractor change, upstream encoding
break) shows up FIRST as a shift in the feature distributions
(perplexity, doc length, entropy) long before keep-rates move. This is
the ops-side counterpart to the data-side `ops/crawldiff.py`: crawl_diff
says WHICH pages changed, psi_drift says whether the CORPUS changed
shape. Rule of thumb thresholds: PSI < 0.1 stable, 0.1-0.25 drifting,
> 0.25 investigate.

Scale shape (100 TB): the corpus is touched by exactly ONE uniform-key
groupBy ((group, bin) — histogram size = value_range/bin_width per group
regardless of corpus size, both snapshot counts accumulated in the same
pass via conditional sums, so no per-snapshot scan and no full-outer bin
alignment join). Everything downstream (totals, smoothing, log terms,
the PSI sum) runs on the tiny bin table; the per-group totals ride back
on a broadcast join. Zero Python — the whole plan is codegen.

Engine-exactness (the repo discipline): bins are integer `div`; counts
are BIGINTs; the add-1-smoothed proportions (k+1)/(n+n_bins) are single
IEEE divisions both engines round identically; the per-bin term
(p_new - p_old) * ln(p_new/p_old) is rounded to 9 decimals (absorbing
the cross-libm ln last-ulp) and summed as DECIMAL(38,9) —
order-independent and exact — then round-6. Add-1 smoothing is not a
fudge: it keeps bins observed in only one snapshot finite (the classic
PSI zero-cell fix) and keeps every input to the FP chain a small
rational.

Reference scope: the reference ships no drift monitor; this extends the
pipeline surface the brief demands (crawl-cadence operations), composing
with `sources/table.py::read_changes` (which snapshot pair to compare)
and `ops/quantiles.py::histogram_bins` (same binning law).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_histogram(
    df: DataFrame,
    value_col: str,
    is_new: Column,
    bin_width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., bin, k_old, k_new) — both snapshots' histograms from ONE
    corpus pass (conditional sums), bin = value div bin_width (integer
    division: the value columns this monitors — n_chars, token counts,
    scaled perplexity — are non-negative integers; pre-scale floats by
    1/resolution upstream as ops/quantiles.py documents)."""
    group_cols = group_cols or []
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    b = F.expr(f"{value_col} div {int(bin_width)}").cast("long")
    return (
        df.select(*group_cols, is_new.alias("_is_new"), b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(
            F.sum(F.when(~F.col("_is_new"), 1).otherwise(0))
            .cast("long")
            .alias("k_old"),
            F.sum(F.when(F.col("_is_new"), 1).otherwise(0))
            .cast("long")
            .alias("k_new"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    is_new: Column,
    bin_width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., n_old, n_new, n_bins, psi) — add-1-smoothed PSI between
    the old and new snapshots' `value_col` distributions, per group.

    psi = sum over the union-bin table of
          (p_new - p_old) * ln(p_new / p_old),
    p_x = (k_x + 1) / (n_x + n_bins); identical distributions give every
    term exactly 0.0 (p_new == p_old bitwise), so psi == 0.0 exactly.
    """
    group_cols = group_cols or []
    cnt = snapshot_histogram(df, value_col, is_new, bin_width, group_cols)
    return psi_from_counts(cnt, group_cols)


def psi_from_counts(
    cnt: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """PSI from an aligned histogram (group..., bin, k_old, k_new) —
    the stage `psi_drift` composes after `snapshot_histogram`, exposed so
    other producers of the same shape (the streaming monitor's per-epoch
    counts joined against a baseline, merged crawl-cadence histograms)
    reuse the identical smoothing/log/DECIMAL-sum arithmetic."""
    group_cols = group_cols or []
    tot = cnt.groupBy(*group_cols).agg(
        F.sum("k_old").cast("long").alias("n_old"),
        F.sum("k_new").cast("long").alias("n_new"),
        F.count("*").cast("long").alias("n_bins"),
    )
    j = (
        cnt.join(F.broadcast(tot), group_cols)
        if group_cols
        else cnt.crossJoin(F.broadcast(tot))
    )
    # Shared-source FP chain: the oracle renders the character-identical
    # expression (psi_term_sql_expr) so both engines perform the same IEEE
    # ops in the same order; round-9 absorbs the ln last-ulp, DECIMAL sum
    # is order-independent.
    term = F.expr(psi_term_sql_expr())
    per_group = (
        j.select(*group_cols, "n_old", "n_new", "n_bins", term.alias("term"))
        .groupBy(*group_cols, "n_old", "n_new", "n_bins")
        .agg(
            F.round(F.sum("term").cast("double"), 6).alias("psi"),
        )
    )
    return per_group.select(*group_cols, "n_old", "n_new", "n_bins", "psi")


def psi_term_sql_expr() -> str:
    """The per-bin PSI term over columns (k_old, k_new, n_old, n_new,
    n_bins), rendered once and executed verbatim by BOTH Spark and the
    DuckDB oracle (ANSI subset both parse)."""
    p_new = "((k_new + 1) / CAST(n_new + n_bins AS DOUBLE))"
    p_old = "((k_old + 1) / CAST(n_old + n_bins AS DOUBLE))"
    return (
        f"CAST(round(({p_new} - {p_old}) * ln({p_new} / {p_old}), 9) "
        "AS DECIMAL(38,9))"
    )
