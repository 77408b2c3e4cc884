"""Unicode normalization for web text — the first transform CCNet applies
before hashing paragraphs (NFD/NFC mismatch otherwise makes byte-identical
prose hash differently across crawls/encoders).

NFC composition has no Spark SQL built-in, so this is an Arrow-batched
pandas UDF over CPython's unicodedata (C implementation, ~10^6 short
strings/sec/core) — the measured-and-justified kind of Python in the hot
path (CLAUDE.md: Arrow UDFs beat interpreted Catalyst for per-element
work). The DuckDB oracle uses its native nfc_normalize, so the gate proves
engine-identical bytes.
"""

from __future__ import annotations

import unicodedata

import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: unicodedata.normalize("NFC", v) if v is not None else None
    )


def nfc_normalize(col: Column) -> Column:
    """NFC-compose a text column (None passes through)."""
    return nfc_normalize_udf(col)


# ---- fuzzy-dedup canonical key (FineWeb/CCNet normalization) -------------

DEDUP_KEY_VERSION = 1


def dedup_key_py(s: str) -> str:
    """Canonical text key for fuzzy dedup (the FineWeb/Penedo et al. 2024
    minhash normalization): lowercase -> NFD -> drop combining marks ->
    non-alphanumeric to space -> collapse whitespace -> trim. Shared
    kernel for the Arrow UDF and tests; the DuckDB twin
    (dedup_key_sql_expr) uses native lower/strip_accents/\\p{L}\\p{N}
    regexes — equivalent on decomposable-accent text (parity-tested);
    non-decomposable letters (ø, ß) differ by design and stay out of the
    gate synthesis."""
    if s is None:
        return None
    s = s.lower()
    s = unicodedata.normalize("NFD", s)
    s = "".join(c for c in s if unicodedata.category(c) != "Mn")
    s = "".join(c if (c.isalnum() or c.isspace()) else " " for c in s)
    return " ".join(s.split())


@pandas_udf(StringType())
def dedup_key_udf(s: pd.Series) -> pd.Series:
    return s.map(dedup_key_py)


def dedup_key(col: Column) -> Column:
    """Arrow-batched canonical-key column — one narrow projection, no
    shuffle; feeds exact dedup (groupBy key) or minhash shingling."""
    return dedup_key_udf(col)


def dedup_key_sql_expr(col: str) -> str:
    """DuckDB oracle twin of dedup_key."""
    t = f"strip_accents(lower({col}))"
    t = rf"regexp_replace({t}, '[^\p{{L}}\p{{N}}\s]', ' ', 'g')"
    t = rf"regexp_replace({t}, '\s+', ' ', 'g')"
    return f"trim({t})"
