"""Size-targeted parquet shard writer.

At 100 TB, output file sizing is a first-order operational concern: too
many small files melt the namenode/object-store listing and make every
downstream scan open 10^7 handles; too few giant files kill read
parallelism. Spark gives no direct rows-per-file control on a shuffled
DataFrame, so this sink fixes the shard count from the data itself:
count (or sample-estimate) the rows, derive n_shards =
ceil(rows / target_rows_per_file), hash-repartition on a uniform key,
write once. The hash repartition also breaks any upstream skew — each
shard gets rows/n_shards ± sqrt, independent of producer partitioning.

Writes a sidecar manifest (rows, shards, schema) next to the data — the
lineage breadcrumb pattern of pipeline/filter_job.py chunk metrics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_balanced_parquet(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    key_col: str | None = None,
) -> dict:
    """Write ``df`` under ``path`` in shards of ~target_rows_per_file
    rows. ``key_col`` (default: whole-row hash via all columns) only
    picks the salt source — shard membership is hash-uniform either way.
    Returns the manifest dict (also persisted as _manifest.json)."""
    if target_rows_per_file < 1:
        raise ValueError(
            f"target_rows_per_file must be >= 1, got {target_rows_per_file}"
        )
    n_rows = df.count()
    n_shards = max(1, -(-n_rows // target_rows_per_file))
    key = F.col(key_col) if key_col else F.concat_ws("\x01", *df.columns)
    # repartition on a uniform hash of the key; the extra column is dropped
    # before the write so the on-disk schema is the caller's
    out = (
        df.withColumn("_shard_key", F.md5(key.cast("string")))
        .repartition(n_shards, "_shard_key")
        .drop("_shard_key")
    )
    out.write.mode("overwrite").parquet(path)
    files = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ]
    manifest = {
        "rows": n_rows,
        "target_rows_per_file": target_rows_per_file,
        "shards": n_shards,
        "files": len(files),
        "schema": df.schema.json(),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
