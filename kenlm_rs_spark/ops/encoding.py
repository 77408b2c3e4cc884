"""Mojibake detection and repair (the ftfy pattern, deterministic subset):
fix UTF-8 text that was at some point decoded as cp1252/Latin-1
("Ã©" → "é", "â€™" → "'") — among the most common defects in
Common-Crawl-style corpora, where origin servers mislabel charsets.

Algorithm (whole-string, strict, to a fixpoint of ≤ ``max_rounds``):
re-encode the string under cp1252 first (its 0x80–0x9F block covers the
€/™/'/" punctuation Latin-1 cannot express), falling back to Latin-1;
if the bytes strictly decode as UTF-8 AND that changes the string, accept
and repeat (double-encoded text needs two rounds). Any encode/decode
failure leaves the string untouched — legitimate accented text ("café")
does not round-trip and is never mangled. Unlike ftfy's heuristics this
subset is a pure function of the input, so the DuckDB oracle can predict
repaired output exactly from the synthesized corruption.

Whole-string boundary: a string MIXING valid non-ASCII and mojibake fails
the strict re-encode and is left unchanged (ftfy fixes per-segment; that
heuristic is not reproducible engine-exactly, so it stays out of the
gate-checked kernel).

Scale shape (100 TB): one narrow Arrow projection — no shuffle, no join;
Python is justified because no Spark builtin exposes charset transcoding
(same argument as ops/normalize.py NFC).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

ENCODING_VERSION = 1

_CODECS = ("cp1252", "latin-1")


def fix_mojibake_py(s: str, max_rounds: int = 3) -> str:
    """Pure-Python kernel — shared by the Arrow UDF, tests, and oracle
    synthesis."""
    if s is None:
        return None
    for _ in range(max_rounds):
        fixed = None
        for codec in _CODECS:
            try:
                b = s.encode(codec)
            except UnicodeEncodeError:
                continue
            try:
                u = b.decode("utf-8")
            except UnicodeDecodeError:
                continue
            fixed = u
            break
        if fixed is None or fixed == s:
            return s
        s = fixed
    return s


def corrupt_utf8_py(s: str, codec: str = "cp1252") -> str:
    """The inverse defect (UTF-8 bytes read under ``codec``) — used to
    synthesize gate/test inputs; 0x80-0x9F bytes without a cp1252 mapping
    fall back to their Latin-1 code points (errors='replace' would lose
    information and break the repair roundtrip)."""
    b = s.encode("utf-8")
    try:
        return b.decode(codec)
    except UnicodeDecodeError:
        return b.decode("latin-1")


@F.pandas_udf(StringType())
def _fix_mojibake_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: fix_mojibake_py(s) if s is not None else None)


@F.pandas_udf(StringType())
def _corrupt_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: corrupt_utf8_py(s) if s is not None else None)


def fix_mojibake_col(col: Column) -> Column:
    """Arrow-batched repair column."""
    return _fix_mojibake_udf(col)


def corrupt_utf8_col(col: Column) -> Column:
    """Arrow-batched corruption column (test/gate synthesis only)."""
    return _corrupt_udf(col)


def repair_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, repaired, was_fixed) — the production projection."""
    fixed = fix_mojibake_col(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        fixed.alias("repaired"),
        (fixed != F.col(text_col)).alias("was_fixed"),
    )
