"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, "HyperLogLog:
the analysis of a near-optimal cardinality estimation algorithm").

Completes the repo's mergeable-sketch family (ops/bloom.py membership,
ops/cms.py frequency): a web-scale corpus report needs distinct counts
(unique URLs per domain, unique tokens per language) where exact
count(DISTINCT) shuffles every value — HLL replaces that with a fixed
m-register table per group. Spark's own ``approx_count_distinct`` IS this
sketch JVM-side; this module exists because the repo's gate discipline
needs an ENGINE-EXACT twin (DuckDB reproduces every register and the
estimate bit-for-bit), and because the register table itself is the
mergeable artifact a pipeline checkpoints and unions across crawls —
``approx_count_distinct`` only exposes the final scalar.

Engine-exact arithmetic (the repo's float-parity discipline):
- hash: first 12 md5 hex digits of ``'{seed}:' || value`` → 48-bit
  integer (sign-safe in a BIGINT; same law as ops/bloom.py / ops/cms.py).
- bucket = h % m; w = h // m (a ``48 - log2(m)``-bit remainder);
  rho = (bits(w-width) - bit_length(w)) + 1 with w = 0 → max rho. The
  bit length is ``length(bin(w))`` — a pure integer/string computation,
  no float log2 whose boundary rounding could differ across engines.
- Z^-1 is kept EXACT: sum over registers of 2^(rho_max − rho) is a
  BIGINT (≤ m·2^rho_max ≤ 2^49 at m = 256), empty registers contribute
  2^rho_max each; the only float op in the raw path is ONE division of
  a precomputed Python double constant by that exact integer —
  IEEE-correctly-rounded identically in Spark and DuckDB.
- Small-range correction (est ≤ 2.5m, V empty registers > 0): linear
  counting m·ln(m/V); ln is libm so the result is round-6ed, which
  absorbs last-ulp differences (the repo's established convention).

Scale shape (100 TB): one uniform-key groupBy (group, bucket) with
map-side combine — register tables are m rows per group no matter the
input size; merging crawl-level sketches is a union + max, never a
re-scan. No window, no join on the corpus.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48  # 12 md5 hex digits, sign-safe in a long


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 §4 bias-correction constants.
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _w_bits(p: int) -> int:
    return HASH_BITS - p


def hll_cols(value: Column, p: int = 8, seed: str = "hll") -> tuple[Column, Column]:
    """(bucket, rho) columns for one value — pure codegen, no Python."""
    m = 1 << p
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), value.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    bucket = (h % m).cast("int")
    w = F.floor(h / m).cast("long")
    wb = _w_bits(p)
    rho = (
        F.when(w == 0, F.lit(wb + 1))
        .otherwise(F.lit(wb + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    seed: str = "hll",
) -> DataFrame:
    """Sketch register table: (group..., bucket, rho=max rho). Only
    populated buckets appear; the estimator accounts for the rest. This
    is the mergeable checkpoint artifact (m rows max per group)."""
    group_cols = group_cols or []
    bucket, rho = hll_cols(F.col(value_col), p=p, seed=seed)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Union two register tables built with the same (p, seed, groups):
    per-bucket max. The HLL merge law — lossless vs re-sketching the
    concatenated inputs."""
    group_cols = [c for c in regs_a.columns if c not in ("bucket", "rho")]
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, p: int = 8
) -> DataFrame:
    """(group..., hll_estimate, v_empty) from a register table. See the
    module docstring for the exact-arithmetic contract shared with the
    SQL twin (__spark_entry__, hll_estimate_sql_exprs)."""
    m = 1 << p
    wb = _w_bits(p)
    rho_max = wb + 1
    group_cols = [c for c in regs.columns if c not in ("bucket", "rho")]
    # C = alpha * m^2 * 2^rho_max, one Python double; the raw estimate is
    # C / S with S the exact BIGINT denominator — a single IEEE division.
    c_lit = _alpha(m) * float(m) * float(m) * float(1 << rho_max)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_max} - rho)"))
        .cast("long")
        .alias("s_pop"),
        F.count("*").cast("long").alias("n_buckets"),
    )
    v = F.lit(m) - F.col("n_buckets")
    s = (F.col("s_pop") + v * F.lit(1 << rho_max)).cast("long")
    raw = F.lit(c_lit) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")), 6),
    ).otherwise(F.round(raw, 6))
    return agg.select(
        *group_cols,
        est.alias("hll_estimate"),
        v.cast("long").alias("v_empty"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    seed: str = "hll",
) -> DataFrame:
    """End-to-end: sketch + estimate in one call."""
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols=group_cols, p=p, seed=seed), p=p
    )


def hll_rho_py(value: str, p: int = 8, seed: str = "hll") -> tuple[int, int]:
    """Python twin of hll_cols for unit tests."""
    m = 1 << p
    h = int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:12], 16)
    bucket = h % m
    w = h // m
    wb = _w_bits(p)
    rho = wb + 1 if w == 0 else wb + 1 - w.bit_length()
    return bucket, rho
