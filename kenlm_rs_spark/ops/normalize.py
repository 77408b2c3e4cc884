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


@pandas_udf("string")
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: unicodedata.normalize("NFC", v) if v is not None else None
    )


def nfc_normalize(col: Column) -> Column:
    """NFC-compose a text column (None passes through)."""
    return nfc_normalize_udf(col)
