"""Linear quality classifier — the CCNet-paper alternative to LM-perplexity
filtering (Wenzek et al. 2020 §4.4 train a fastText linear classifier to
approximate the expensive filter; same public pattern here): a logistic
model over the cheap heuristic features, distilled offline against the full
pipeline's keep/drop labels, then applied as a PURE Catalyst expression —
no model broadcast, no Python, one codegen projection per document.

Train/serve split:
- ``tools/train_quality_classifier.py`` recomputes features + labels on the
  deterministic synthetic corpus (seed 42, the frozen ``fixtures/expected``
  labels) and fits standardized logistic regression with fixed-seed
  full-batch gradient descent. Its output is FROZEN below; the pytest
  regression re-runs training and asserts the exact weights reproduce
  (same discipline as the frozen lmplz ARPA bytes).
- Inference is ``classifier_score_col`` / ``classifier_score_sql_expr`` —
  twin renderings of the SAME frozen constants, so a DuckDB oracle checks
  the Spark expression byte-for-byte. The emitted score is the LINEAR
  logit z (monotone in the probability; sigmoid(z) >= 0.5 <=> z >= 0), so
  the gate compares pure +,*,/ double arithmetic in a fixed association
  order — engine-exact, no transcendental-function ulp risk.

Features are the round-6 heuristic columns (already proven engine-identical
by the ``quality_features`` gate row) plus the raw token count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..ops import textstats as ts

CLASSIFIER_VERSION = 1

# frozen by tools/train_quality_classifier.py (seed 42, 1000 pages,
# labels = fixtures/expected keep; 3000 GD steps, lr 0.5). DO NOT EDIT BY
# HAND — rerun the tool and paste its output.
FEATURES = ["n_tokens", "symbol_ratio", "digit_ratio", "stop_ratio", "mean_word_len", "dup3_frac"]
MU = {
    "n_tokens": 123.754,
    "symbol_ratio": 0.075215,
    "digit_ratio": 0.001036,
    "stop_ratio": 0.018911,
    "mean_word_len": 4.370148,
    "dup3_frac": 0.123246,
}
SD = {
    "n_tokens": 92.123632,
    "symbol_ratio": 0.080793,
    "digit_ratio": 0.003389,
    "stop_ratio": 0.040448,
    "mean_word_len": 0.693995,
    "dup3_frac": 0.264084,
}
WEIGHTS = {
    "n_tokens": 1.682831,
    "symbol_ratio": -0.587058,
    "digit_ratio": -0.846528,
    "stop_ratio": -0.630066,
    "mean_word_len": -0.413878,
    "dup3_frac": -1.789264,
}
BIAS = -0.000827
# metrics at freeze (vs the full-pipeline labels, rounded constants):
# precision 0.8389, recall 0.858, F1 0.8483, accuracy 0.838 — the cheap
# 6-feature logit recovers ~85% of the LM+rules decision with zero scoring
# cost (the CCNet-paper trade-off, Wenzek et al. 2020 §4.4)


def feature_cols(text: Column) -> dict[str, Column]:
    """The classifier's input features as Spark columns (round-6, matching
    the quality_features gate row's proven-engine-identical expressions)."""
    toks = ts.tokens_col(text)
    return {
        "n_tokens": F.size(toks).cast("double"),
        "symbol_ratio": F.round(ts.symbol_ratio(text), 6),
        "digit_ratio": F.round(ts.digit_ratio(text), 6),
        "stop_ratio": F.round(
            F.size(F.filter(toks, lambda w: F.lower(w).isin(*ts.STOPWORDS)))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ),
        "mean_word_len": F.round(
            F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ),
        "dup3_frac": F.round(ts.dup_fraction_from_tokens(toks, 3), 6),
    }


def classifier_score_col(text: Column) -> Column:
    """Linear logit z = BIAS + sum_i W_i * (f_i - MU_i) / SD_i, accumulated
    in FEATURES order (fixed association — engine-deterministic)."""
    f = feature_cols(text)
    z = F.lit(float(BIAS))
    for name in FEATURES:
        z = z + F.lit(float(WEIGHTS[name])) * (
            (f[name] - F.lit(float(MU[name]))) / F.lit(float(SD[name]))
        )
    return z


def classifier_keep_col(text: Column) -> Column:
    """keep <=> sigmoid(z) >= 0.5 <=> z >= 0."""
    return classifier_score_col(text) >= 0


# ---- SQL twin (DuckDB oracle) -------------------------------------------

_TOKS_SQL = "list_filter(string_split_regex({col}, '[\\x00\\t\\n\\r ]+'), y -> y != '')"


def _feature_sql(col: str) -> dict[str, str]:
    toks = _TOKS_SQL.format(col=col)
    stop_list = "['" + "','".join(ts.STOPWORDS) + "']"
    grams3 = "[array_to_string(tk[i+1:i+3], ' ') for i in range(len(tk)-2)]"
    return {
        "n_tokens": f"CAST(len(tk) AS DOUBLE)",
        "symbol_ratio": (
            f"round(length(regexp_replace({col}, '[A-Za-z0-9 ]', '', 'g'))"
            f" / greatest(length({col}), 1), 6)"
        ),
        "digit_ratio": (
            f"round((length({col}) - length(regexp_replace({col}, '[0-9]', '', 'g')))"
            f" / greatest(length({col}), 1), 6)"
        ),
        "stop_ratio": (
            f"round(len(list_filter(list_transform(tk, y -> lower(y)),"
            f" y -> list_contains({stop_list}, y))) / greatest(len(tk), 1), 6)"
        ),
        "mean_word_len": (
            f"round(list_aggregate(list_transform(tk, y -> length(y)), 'sum')"
            f" / greatest(len(tk), 1), 6)"
        ),
        "dup3_frac": (
            f"round(CASE WHEN len(tk) <= 2 THEN 0.0"
            f" ELSE 1.0 - len(list_distinct({grams3})) / len({grams3}) END, 6)"
        ),
        "__toks": toks,
    }


def classifier_score_sql_expr(col: str) -> str:
    """The SAME logit as DuckDB SQL. Requires a lateral alias ``tk`` for the
    token list — use via ``classifier_sql_query``."""
    f = _feature_sql(col)
    z = repr(float(BIAS))
    for name in FEATURES:
        z = (
            f"({z} + {float(WEIGHTS[name])!r} * "
            f"(({f[name]} - {float(MU[name])!r}) / {float(SD[name])!r}))"
        )
    return z


def classifier_sql_query(table: str = "documents", col: str = "text") -> str:
    """(doc_id, score round 6, pred_keep) over ``table`` — the oracle twin
    of the gate query."""
    toks = _TOKS_SQL.format(col=col)
    z = classifier_score_sql_expr(col)
    return (
        f"SELECT doc_id, round({z}, 6) AS score, ({z}) >= 0 AS pred_keep "
        f"FROM (SELECT *, {toks} AS tk FROM {table})"
    )
