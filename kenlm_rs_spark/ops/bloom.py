"""Deterministic Bloom filter for set-membership at corpus scale.

Where it fits: decontamination / URL-seen / "already crawled" checks where
the seen-set is huge but its BITS fit in executor memory. An exact broadcast
join needs the full key set shipped (GBs for 10^9 URLs); a Bloom filter at
10 bits/key is ~1.2 GB for 10^9 keys with <1% false positives — and the
corpus side stays a NARROW projection: hash, test bits, done. No shuffle,
no join. False positives only (never false negatives), so the right
composition at scale is bloom-prefilter → exact verify on the tiny maybe-set
(same blocking-then-verify shape as the LSH dedup kernels in ops/dedup.py).

Hashing is the repo's engine-portable md5 idiom (pipeline/quality.py:65):
position_i(key) = int(first 12 hex digits of md5("seed:i:key")) mod m_bits.
k independent functions come from salting the digest with i — Kirsch-
Mitzenstein double hashing would halve the md5 calls but the per-i salt
keeps the DuckDB twin a one-line expression.

Two probe paths:
- expression path (``bloom_might_contain``): the bitmap is inlined as a
  literal array<long> of m/64 words; the bit test is pure whole-stage
  codegen (element_at + shiftrightunsigned + AND) — zero Python, zero
  shuffle. Right for m up to ~2^22 (literal size ~ m/8 bytes in the plan).
- Arrow path (``bloom_might_contain_udf``): the bitmap ships once as a
  broadcast numpy array; a pandas UDF tests bits per Arrow batch. Right for
  the 100 TB shape (m in the hundreds of millions to billions of bits,
  far beyond what a plan literal should carry).

Both paths are value-identical (tests/test_bloom.py asserts it).
"""

from __future__ import annotations

import hashlib
from functools import reduce

import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position_col(key: Column, i: int, m_bits: int, seed: str) -> Column:
    """Engine-portable bit position: first 12 md5 hex digits (48 bits,
    sign-safe in a long) of 'seed:i:key', mod m_bits."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:{i}:"), key.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def _position_py(key: str, i: int, m_bits: int, seed: str) -> int:
    return (
        int(hashlib.md5(f"{seed}:{i}:{key}".encode()).hexdigest()[:12], 16)
        % m_bits
    )


def bloom_build(
    keys_df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 5,
    seed: str = "bloom",
) -> DataFrame:
    """The filter as a TABLE of distinct set bit positions (pos: long).
    One explode + distinct over |set| * k rows; at most m_bits rows out.
    This is the durable representation (write it as parquet, rebuild the
    bitmap anywhere)."""
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    key = F.col(key_col)
    return (
        keys_df.select(
            F.explode(
                F.array(
                    *[_position_col(key, i, m_bits, seed) for i in range(k)]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bitmap_words(positions: list[int], m_bits: int) -> list[int]:
    """Pack bit positions into m_bits/64 signed 64-bit words (Spark longs
    are signed: a set bit 63 wraps to the negative representation)."""
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    df: DataFrame,
    positions: list[int],
    key_col: str,
    m_bits: int,
    k: int = 5,
    seed: str = "bloom",
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Expression-path probe: bitmap inlined as a literal array<long>; the
    k bit tests are an AND-chain of pure codegen expressions. The corpus
    never shuffles and no Python runs."""
    words = bitmap_words(positions, m_bits)
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])
    key = F.col(key_col)

    def bit_set(i: int) -> Column:
        pos = _position_col(key, i, m_bits, seed)
        word = F.element_at(
            words_lit, (F.floor(pos / 64) + 1).cast("int")
        )
        return F.getbit(word, pos.bitwiseAND(F.lit(63))) == 1

    maybe = reduce(lambda a, b: a & b, [bit_set(i) for i in range(k)])
    return df.withColumn(out_col, maybe)


def bloom_bitmap_df(
    keys_df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 5,
    seed: str = "bloom",
) -> DataFrame:
    """The filter as a LAZY 1-row frame (words: array<long>, m/64 packed
    words) built entirely in-plan — one groupBy(word index) bit_or plus a
    dense-array assembly — so a probe needs NO blocking positions collect
    (r7 second pass, guide §1.2-1: the collect was a full sequential wave
    over the seen-key scan).  Bit content is identical to
    bitmap_words(bloom_build(...)): OR is idempotent so the positions
    table's distinct is unnecessary, and shiftleft(1L, p&63) wraps the
    sign bit exactly like the Python packer.  Lineage is checkpoint-
    truncated so multi-branch consumers embed a 1-row scan, not the
    seen-key subtree."""
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    n_words = (m_bits + 63) // 64
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_position_col(key, i, m_bits, seed) for i in range(k)])
    ).alias("pos")
    return (
        keys_df.select(pos)
        .select(
            F.shiftright("pos", 6).cast("int").alias("wi"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos & 63 as int))").alias(
                "b"
            ),
        )
        .groupBy("wi")
        .agg(F.expr("bit_or(b)").alias("w"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("wi", "w"))).alias("m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i), F.lit(0).cast("long")
                ),
            ).alias("words")
        )
        .localCheckpoint(eager=False)
    )


def bloom_might_contain_col(
    df: DataFrame,
    words_df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 5,
    seed: str = "bloom",
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Probe against a ``bloom_bitmap_df`` frame: the 1-row words array
    arrives by broadcast cross join and the k bit tests are the identical
    codegen AND-chain of the literal path — value-equal by construction
    (tests/test_bloom.py asserts all three paths agree)."""
    key = F.col(key_col)

    def bit_set(i: int) -> Column:
        pos = _position_col(key, i, m_bits, seed)
        word = F.element_at(
            F.col("__bloom_words"), (F.floor(pos / 64) + 1).cast("int")
        )
        return F.getbit(word, pos.bitwiseAND(F.lit(63))) == 1

    maybe = reduce(lambda a, b: a & b, [bit_set(i) for i in range(k)])
    return (
        df.crossJoin(
            F.broadcast(words_df.select(F.col("words").alias("__bloom_words")))
        )
        .withColumn(out_col, maybe)
        .drop("__bloom_words")
    )


def bloom_might_contain_udf(
    df: DataFrame,
    bitmap,
    key_col: str,
    m_bits: int,
    k: int = 5,
    seed: str = "bloom",
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Arrow-path probe for big filters: ``bitmap`` is a numpy uint64 array
    (from ``bitmap_words`` reinterpreted unsigned) broadcast once per
    executor; bits are tested per Arrow batch. Same semantics as the
    expression path."""
    import numpy as np
    from pyspark.sql.types import BooleanType

    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(bitmap, dtype=np.uint64)
    )

    @F.pandas_udf(BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        bm = bc.value
        out = np.ones(len(keys), dtype=bool)
        svals = keys.astype(str)
        for i in range(k):
            pos = np.fromiter(
                (_position_py(v, i, m_bits, seed) for v in svals),
                dtype=np.int64,
                count=len(svals),
            )
            w = bm[pos >> 6]
            bits = (w >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
            out &= bits == np.uint64(1)
        return pd.Series(out)

    return df.withColumn(out_col, probe(F.col(key_col).cast("string")))
