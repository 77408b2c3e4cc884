"""Streaming distribution-drift monitor — the crawl-cadence deployment of
`ops/drift.py`: a BASELINE histogram is fitted offline on the last
blessed snapshot (the `snapshot_histogram` k_old side), the live corpus
streams in, and every trigger emits the PSI of the stream-so-far against
the baseline, per group. The time series is the alarm feed: a quality
regression upstream (extractor change, spam wave, encoding break) bends
the PSI curve within one trigger of arriving, long before corpus-level
keep-rates move.

Shape: the running per-(group, bin) counts live in the streaming
aggregation state store — state size = groups x (value_range/bin_width),
independent of stream length, the same bounded-state argument as
`streaming/ngram_counts.py`'s vocab-sized state. Each trigger's complete
histogram joins the tiny broadcast baseline and runs the IDENTICAL
`psi_from_counts` arithmetic as the batch op (shared code, not a twin),
so stream==batch equality is exact and pytest-pinned: the monitor's PSI
after the final trigger equals `psi_drift` on the concatenated batch.

Output mode: complete + foreachBatch — the per-epoch histogram is
re-emitted whole (it is bounded and tiny), PSI is computed on it, and
one (epoch, group..., psi) row set is appended to the sink per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.drift import psi_from_counts


def streaming_new_counts(
    pages: DataFrame,
    value_col: str,
    bin_width: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., bin, k_new) — the streaming aggregation whose state is
    the running new-snapshot histogram (bounded: bins x groups rows)."""
    group_cols = group_cols or []
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    b = F.expr(f"{value_col} div {int(bin_width)}").cast("long")
    return (
        pages.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("k_new"))
    )


def psi_vs_baseline(
    new_counts: DataFrame,
    baseline: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """PSI of a (group..., bin, k_new) histogram against a
    (group..., bin, k_old) baseline — full-outer bin alignment (both
    tables are bounded bin tables, never corpus-sized), zeros filled,
    then the SHARED `psi_from_counts` arithmetic."""
    group_cols = group_cols or []
    keys = [*group_cols, "bin"]
    cnt = (
        new_counts.join(baseline, keys, "full_outer")
        .select(
            *keys,
            F.coalesce(F.col("k_old"), F.lit(0)).cast("long").alias("k_old"),
            F.coalesce(F.col("k_new"), F.lit(0)).cast("long").alias("k_new"),
        )
    )
    return psi_from_counts(cnt, group_cols)


def start_drift_monitor(
    pages: DataFrame,
    baseline: DataFrame,
    value_col: str,
    bin_width: int,
    out_path: str,
    checkpoint: str,
    group_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Stream `pages`; per trigger, append (epoch_id, group..., n_old,
    n_new, n_bins, psi) parquet rows — PSI of the stream-so-far vs the
    broadcast `baseline` (group..., bin, k_old). Returns the query."""
    group_cols = group_cols or []
    counts = streaming_new_counts(pages, value_col, bin_width, group_cols)
    b = F.broadcast(baseline)

    def emit(batch_df, epoch_id: int) -> None:
        out = psi_vs_baseline(batch_df, b, group_cols).withColumn(
            "epoch_id", F.lit(int(epoch_id))
        )
        out.write.mode("append").parquet(out_path)

    writer = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(emit)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
