"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models: ...",
Appendix A1.1 — public): the second standard heuristic rule set next to the
CCNet-style rules in pipeline/quality.py (kept separate so the frozen CCNet
RULES_VERSION semantics stay untouched).

All features are pure Spark SQL expressions (whole-stage codegen, no UDFs):
- word count bounds [min_words, max_words]
- mean word length bounds [3, 10]
- symbol-to-word ratio (# or ...) <= 0.1
- < 90% of lines start with a bullet; < 30% end with an ellipsis
- >= 80% of words contain an alphabetic character
- >= 2 distinct Gopher stop words present
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import ngrams_col, tokens_col

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORDS = 2


def _lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")


def gopher_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the Gopher rule features; tokenize/line-split once each."""
    t = F.col(text_col)
    out = df.withColumn("_toks", tokens_col(t)).withColumn("_lines", _lines(t))
    toks = F.col("_toks")
    lines = F.col("_lines")
    n_words = F.size(toks)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    return (
        out.withColumn("g_n_words", n_words)
        .withColumn(
            # total word chars via one concat (codegen) instead of an
            # interpreted aggregate() lambda (CLAUDE.md HOF gotcha)
            "g_mean_word_len",
            F.when(
                n_words > 0,
                F.length(F.concat_ws("", toks)).cast("double") / n_words,
            ).otherwise(0.0),
        )
        .withColumn(
            "g_symbol_word_ratio",
            F.when(
                n_words > 0,
                (
                    F.size(F.split(t, "#", -1)) - 1
                    + F.size(F.split(t, "\\.\\.\\.", -1)) - 1
                ) / n_words,
            ).otherwise(0.0),
        )
        .withColumn(
            "g_bullet_line_frac",
            F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]")))
            / n_lines,
        )
        .withColumn(
            "g_ellipsis_line_frac",
            F.size(F.filter(lines, lambda l: F.trim(l).rlike("(\\.\\.\\.|…)$")))
            / n_lines,
        )
        .withColumn(
            "g_alpha_word_frac",
            F.when(
                n_words > 0,
                F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / n_words,
            ).otherwise(0.0),
        )
        .withColumn(
            "g_n_stopwords",
            F.size(
                F.array_intersect(
                    F.array_distinct(F.transform(toks, F.lower)),
                    F.array([F.lit(w) for w in GOPHER_STOPWORDS]),
                )
            ),
        )
        .drop("_toks", "_lines")
    )


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    top_ngram_orders: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher A1.2 repetition signals, per document:

    - dup_line_frac:       (line occurrences - distinct lines) / lines
    - dup_line_char_frac:  characters in repeated line occurrences (beyond
                           the first of each) / total line characters
    - top{n}gram_char_frac (n in top_ngram_orders): occurrences of the most
      frequent word n-gram x its character length / document characters.
      Tie-break: smallest gram string (deterministic, engine-portable).

    Spark shape: explode lines/ngrams -> groupBy (doc, unit) -> per-doc agg.
    Both shuffles key on (doc_id, unit) — uniform; no window sorts. The
    char-overlap-aware duplicate n-gram fractions of the full A1.2 spec are
    intentionally out of scope (their overlap attribution is not portable
    SQL); these line + top-gram signals are the load-bearing ones."""
    doc = F.col(id_col).alias("doc_id")
    lines = df.select(doc, F.explode(_lines(F.col(text_col))).alias("line"))
    per_line = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    line_feats = per_line.groupBy("doc_id").agg(
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("dup_line_frac"),
        (
            F.sum((F.col("c") - 1) * F.length("line"))
            / F.sum(F.col("c") * F.length("line"))
        ).alias("dup_line_char_frac"),
    )
    out = df.select(doc, F.length(text_col).alias("n_chars"))
    for n in top_ngram_orders:
        grams = df.select(
            doc, F.explode(ngrams_col(F.col(text_col), n)).alias("gram")
        )
        per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        # tie-break on the SMALLEST gram among max-count grams
        top = per_gram.join(
            per_gram.groupBy("doc_id").agg(F.max("c").alias("cmax")), "doc_id"
        ).filter(F.col("c") == F.col("cmax")).groupBy("doc_id").agg(
            F.min("gram").alias("top_gram"), F.first("cmax").alias("top_c")
        )
        feat = top.select(
            "doc_id",
            (F.col("top_c") * F.length("top_gram")).alias(f"_topchars{n}"),
        )
        out = out.join(feat, "doc_id", "left")
    sel = [
        "doc_id",
        F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
    ]
    out = out.join(line_feats, "doc_id", "left")
    for n in top_ngram_orders:
        sel.append(
            F.when(
                F.col("n_chars") > 0,
                F.coalesce(F.col(f"_topchars{n}"), F.lit(0)) / F.col("n_chars"),
            ).otherwise(0.0).alias(f"top{n}gram_char_frac")
        )
    return out.select(*sel)


def gopher_decide(df: DataFrame) -> DataFrame:
    """Attach gopher_keep + gopher_drop_reason (first failing rule, fixed
    Gopher order). Input must carry the gopher_features columns."""
    reasons = [
        (F.col("g_n_words") < MIN_WORDS, "too_few_words"),
        (F.col("g_n_words") > MAX_WORDS, "too_many_words"),
        (F.col("g_mean_word_len") < MIN_MEAN_WORD_LEN, "mean_word_len_low"),
        (F.col("g_mean_word_len") > MAX_MEAN_WORD_LEN, "mean_word_len_high"),
        (F.col("g_symbol_word_ratio") > MAX_SYMBOL_WORD_RATIO, "symbol_ratio"),
        (F.col("g_bullet_line_frac") > MAX_BULLET_LINE_FRAC, "bullet_lines"),
        (F.col("g_ellipsis_line_frac") > MAX_ELLIPSIS_LINE_FRAC, "ellipsis_lines"),
        (F.col("g_alpha_word_frac") < MIN_ALPHA_WORD_FRAC, "non_alpha_words"),
        (F.col("g_n_stopwords") < MIN_STOPWORDS, "stopwords"),
    ]
    reason = F.lit(None).cast("string")
    for cond, name in reversed(reasons):
        reason = F.when(cond, name).otherwise(reason)
    return df.withColumn("gopher_drop_reason", reason).withColumn(
        "gopher_keep", F.col("gopher_drop_reason").isNull()
    )
