"""Text analysis operators over document tables — pure Spark SQL columns.

Everything here stays inside whole-stage codegen (no Python). These are the
heuristic-quality / token-accounting primitives a CCNet-style filter needs
(SURVEY.md §7 step 11) plus training-data-pipeline extras (token counting,
document fingerprinting, n-gram generation reused by the dedup operators and
by the lmplz builder's CorpusCount stage A1).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference's exact corpus delimiters (corpus_count.cc:241-246)
TOKEN_SPLIT = "[\\x00\\t\\n\\r ]+"

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on as "
    "with at by from i you he she we they".split()
)


def tokens_col(text: Column) -> Column:
    """Split on the reference delimiter set, dropping empties."""
    return F.filter(F.split(text, TOKEN_SPLIT), lambda w: w != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def symbol_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def digit_ratio(text: Column) -> Column:
    digits = F.length(text) - F.length(F.regexp_replace(text, "[0-9]", ""))
    return digits / F.greatest(F.length(text), F.lit(1))


def uppercase_ratio(text: Column) -> Column:
    upper = F.length(text) - F.length(F.regexp_replace(text, "[A-Z]", ""))
    return upper / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    stops = F.filter(toks, lambda w: w.isin(*STOPWORDS))
    return F.size(stops) / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(toks), F.lit(1))


def ngrams_col(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (sliding windows).

    Built as a zip_with chain over n shifted slices — O(tokens) work per row,
    unlike the naive per-index slice-inside-transform which is O(tokens^2)
    in interpreted higher-order functions (measured 20x slower)."""
    toks = tokens_col(text)
    return ngrams_from_tokens(toks, n)


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, m)
    for i in range(1, n):
        nxt = F.slice(toks, F.lit(i + 1), m)
        out = F.zip_with(out, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return out


def dup_fraction_from_tokens(toks: Column, n: int = 3) -> Column:
    """1 - distinct/total n-grams, built NATIVELY: shifted slices zipped
    into an array<struct> with arrays_zip (codegen, no interpreted lambda),
    distinct-counted as structs. Struct distinctness == joined-string
    distinctness because tokens cannot contain the join character.
    Measured 2.7x faster than the zip_with string-concat chain."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    return F.when(F.size(z) <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(z)) / F.size(z)
    )


def dup_ngram_fraction(text: Column, n: int = 3) -> Column:
    """Repetition measure: 1 - distinct/total word n-grams (the dup-line
    fraction analogue for single-line documents)."""
    return dup_fraction_from_tokens(tokens_col(text), n)


_DELIM_TABLE = str.maketrans({c: " " for c in "\x00\t\n\r "})


def make_dup3_udf():
    """Arrow-vectorized dup3 for the filter hot path. MEASURED on 120k pages
    at local[8]: interpreted zip_with chain 14.5s, native arrays_zip 5.3s,
    this pandas UDF 1.2s — the one case where a Python UDF beats Catalyst,
    because higher-order lambdas are interpreted per element while CPython's
    zip/set over an Arrow batch is C-speed. Values are exactly equal
    (verified row-for-row and by the quality_features oracle)."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def dup3_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in (t or "").translate(_DELIM_TABLE).split(" ") if w]
            total = len(toks) - 2
            if total <= 0:
                out.append(0.0)
                continue
            out.append(1.0 - len(set(zip(toks, toks[1:], toks[2:]))) / total)
        return pd.Series(out)

    return dup3_udf


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text. Stable across engines (used as the dedup key)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), TOKEN_SPLIT, " ")
    return F.md5(normalized)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full heuristic feature set as flat columns.

    Tokenization is materialized ONCE into a temp column and every
    token-derived feature reads it — Catalyst does not CSE the split across
    independent column expressions, and the split dominates the stage cost."""
    t = F.col(text_col)
    toks = F.col("__toks")
    out = (
        df.withColumn("__toks", tokens_col(t))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("n_chars_m", char_count(t))
        .withColumn("symbol_ratio", symbol_ratio(t))
        .withColumn("digit_ratio", digit_ratio(t))
        .withColumn("upper_ratio", uppercase_ratio(t))
        .withColumn(
            "stop_ratio",
            F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS)))
            / F.greatest(F.size(toks), F.lit(1)),
        )
        .withColumn(
            "mean_word_len",
            F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
            / F.greatest(F.size(toks), F.lit(1)),
        )
        # dup3 via the Arrow UDF: 12x the interpreted zip_with chain, exactly
        # equal values (see make_dup3_udf's measurement note)
        .withColumn("dup3_frac", make_dup3_udf()(t))
        .drop("__toks")
    )
    return out


def explode_ngrams(df: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """documents -> one row per word n-gram occurrence (CorpusCount shape, A1).

    At scale this is a narrow map — no shuffle until the downstream
    groupBy(ngram).count(), where Catalyst inserts partial aggregation
    (the reference's per-block hash dedupe + sort combiner, A1/A2)."""
    return df.select(F.explode(ngrams_col(F.col(text_col), n)).alias("ngram"))


def ngram_counts(df: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    return explode_ngrams(df, n, text_col).groupBy("ngram").agg(
        F.count("*").alias("count")
    )


# BPE-ish subword segmentation: letter runs, digit runs, and single
# punctuation marks each count as one token (the GPT-2-style pre-tokenizer
# shape, minus byte merges — a deterministic proxy for tokenizer cost
# accounting at corpus scale).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))
