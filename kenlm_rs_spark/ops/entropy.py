"""Character-distribution entropy — the cheap "is this text or noise"
quality signal (low entropy = repeated-character spam / boilerplate;
abnormally high = base64 blobs, minified JS, random padding). Used as a
drop rule alongside the Gopher heuristics (ops/gopher.py) and as a
feature for the distilled classifier (pipeline/classifier.py).

Scale shape (100 TB): ONE narrow Arrow stage — per-batch NumPy codepoint
bincounts, no explode (a char-level explode would shuffle ~n_chars rows,
i.e. the whole corpus, for a per-doc scalar), no join, no shuffle at all.

Engine-exactness: per-codepoint probabilities are IEEE-exact rationals
(count/len); each term p*log2(p) is rounded to 9 decimals (round-9
absorbs the libm log2 last-ulp, the repo discipline) and the DuckDB twin
sums the same terms as DECIMAL(38,9) — order-independent — so the
round-6 entropy can only diverge on a measure-zero rounding knife-edge.
The Spark side sums the SAME pre-rounded terms in codepoint order; with
<= alphabet-size terms the float-sum error is ~1e-13, far inside
round-6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("n_cp", LongType()),
        StructField("n_distinct_cp", LongType()),
        StructField("char_entropy", DoubleType()),
    ]
)


def _entropy_one(text: str) -> tuple[int, int, float]:
    cps = np.frombuffer(
        (text or "").encode("utf-32-le"), dtype=np.uint32
    )
    n = int(cps.size)
    if n == 0:
        return 0, 0, 0.0
    _, counts = np.unique(cps, return_counts=True)
    p = counts.astype(np.float64) / float(n)
    terms = np.round(p * np.log2(p), 9)  # round-9 per term, then sum
    # + 0.0 normalizes the single-char case's -0.0 to +0.0 (the SQL twin's
    # DECIMAL sum has no signed zero)
    return n, int(counts.size), float(round(-terms.sum(), 6)) + 0.0


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_cp, n_distinct_cp, char_entropy) — entropy in bits per
    codepoint, 0.0 for empty text."""

    @F.pandas_udf(_SCHEMA)
    def ent(texts: pd.Series) -> pd.DataFrame:
        rows = [_entropy_one(t) for t in texts.fillna("")]
        return pd.DataFrame(
            rows, columns=["n_cp", "n_distinct_cp", "char_entropy"]
        )

    return df.select(
        F.col(id_col).alias("doc_id"), ent(F.col(text_col)).alias("_e")
    ).select("doc_id", "_e.n_cp", "_e.n_distinct_cp", "_e.char_entropy")
