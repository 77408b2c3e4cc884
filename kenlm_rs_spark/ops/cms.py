"""Count-min sketch: fixed-memory frequency estimation over unbounded key
streams (Cormode & Muthukrishnan 2005, "An Improved Data Stream Summary: the
Count-Min Sketch and its Applications").

Where it fits at 100 TB: exact token/URL/domain frequency tables are
corpus-sized (the vocabulary of a web corpus grows without bound), but many
pipeline decisions only need approximate counts with a one-sided error —
hot-key detection for salting (ops/partitioning.py), frequency caps for
winnowing/LSH fan-out bounds, stopword discovery. The sketch is d×w cells
(d ~ 4 rows, w ~ millions of columns → MBs) REGARDLESS of corpus size:
build = one narrow d-fold expansion + one groupBy on uniformly-hashed
cells (no skew by construction — hashing spreads hot keys' cells), estimate
= broadcast the model-sized sketch and take the min over d cells.
Guarantee: estimate >= true count always; overshoot <= eps*N with
probability 1-delta for w = e/eps, d = ln(1/delta).

Hashing is the repo's engine-portable salted-md5 idiom
(pipeline/quality.py:65, ops/bloom.py): cell_r(key) = int(first 12 md5 hex
digits of "seed:r:key") mod w — the DuckDB twin reproduces the sketch
cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell_col(key: Column, r: int, w: int, seed: str) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:{r}:"), key.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int,
    depth: int = 4,
    weight_col: str | None = None,
    seed: str = "cms",
) -> DataFrame:
    """Build the sketch from one row per key OCCURRENCE (or per key with a
    ``weight_col`` increment). Returns the sketch as a TABLE
    (row int, pos long, cnt long) — at most depth*width rows, the durable
    representation (write as parquet, merge sketches by summing cells:
    CMS is a linear sketch)."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    key = F.col(key_col)
    inc = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cell_col(key, r, width, seed).alias("pos"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("rp"), inc.alias("_inc"))
        .groupBy(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .agg(F.sum("_inc").alias("cnt"))
    )


def cms_estimate(
    queries_df: DataFrame,
    sketch_df: DataFrame,
    key_col: str,
    width: int,
    depth: int = 4,
    seed: str = "cms",
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point estimates for the keys in ``queries_df``: min over the d cells
    each key hashes to. The sketch is broadcast (model-sized); the query
    side expands d× then aggregates back — keys never seen by the sketch
    estimate 0 (absent cells count as empty)."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cell_col(key, r, width, seed).alias("pos"),
            )
            for r in range(depth)
        ]
    )
    expanded = queries_df.select(
        "*", F.explode(cells).alias("_rp")
    ).select("*", F.col("_rp.row").alias("_row"), F.col("_rp.pos").alias("_pos"))
    joined = expanded.join(
        F.broadcast(sketch_df),
        (F.col("_row") == sketch_df["row"]) & (F.col("_pos") == sketch_df["pos"]),
        "left",
    )
    group_cols = [c for c in queries_df.columns]
    return (
        joined.withColumn("_cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(*group_cols)
        .agg(F.min("_cnt").cast("long").alias(out_col))
    )
