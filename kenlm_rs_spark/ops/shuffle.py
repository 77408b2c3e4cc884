"""Deterministic training-order shuffle: assign every document a stable
(shard, pos) so the training dataloader reads shard files sequentially and
the global example order is (a) uniformly shuffled, (b) reproducible
across re-runs and engines, (c) re-derivable per epoch from a seed.

This is the "global shuffle without a global sort" every training-data
pipeline ends with: a true ORDER BY md5(id) over 10^12 rows is a single
total-order sort (range-partition + skew risk + one giant stage), while
sharding first on the SAME hash makes each shard an independent
within-partition sort of N/S rows — one shuffle on a uniform key, sorts
run in parallel and spill locally. Reading shards in index order then
visits documents in an order statistically indistinguishable from the
global md5 order (the hash is uniform; the shard index is itself derived
from the leading hash bits' complement — see below — so no correlation
with the within-shard rank).

Different epochs = different seeds; the (shard, pos) mapping changes
completely (md5 avalanche).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def training_order(
    df: DataFrame,
    n_shards: int,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Input columns + (shard, pos): shard in [0, n_shards), pos 1-based
    within shard. shard comes from the TAIL of the md5 key and the
    within-shard order from the full key, so shard membership and rank are
    decorrelated; ties (impossible for distinct ids) break on id."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        F.conv(F.substring(key, 25, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        df.withColumn("_key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_key")
    )
