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

from .textstats import ngrams_from_tokens, tokens_col

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

    Spark shape (VERDICT r3 item 5 — single-pass; r7: ONE shuffle):
    tokenize ONCE, build lines + every n-gram order in one projection,
    explode the concatenated (order, unit) array once, and exchange the
    unit stream ONCE keyed by doc_id: HashPartitioning(doc_id) satisfies
    the clustering requirement of BOTH the groupBy(doc, order, unit)
    count and the groupBy(doc) conditional aggregate, so neither inserts
    its own exchange (the former shape shuffled the unit stream by
    (doc, order, unit) and the count rows by doc — measured 1.71→1.37 s
    best-of-3 interleaved on sf0.1, value-identical on all docs). The
    max-count/min-gram tie-break becomes min(struct(-c, gram)) so no
    per-order self-join is needed. All shuffle keys are uniform (a
    mega-document bounds a partition, and Gopher docs are length-capped
    upstream); no window sorts. The char-overlap-aware duplicate n-gram fractions of the full
    A1.2 spec are intentionally out of scope (their overlap attribution is
    not portable SQL); these line + top-gram signals are the load-bearing
    ones."""
    doc = F.col(id_col).alias("doc_id")
    toks = tokens_col(F.col(text_col))
    unit_arrays = [
        F.transform(
            _lines(F.col(text_col)),
            lambda l: F.struct(F.lit(0).alias("order"), l.alias("unit")),
        )
    ]
    def _tag(order):
        # NOTE: a `lambda g, _n=n:` default is NOT usable here — PySpark
        # treats any two-parameter HOF lambda as the (element, index) form
        # and binds the second name to the element index
        return lambda g: F.struct(F.lit(order).alias("order"), g.alias("unit"))

    for n in top_ngram_orders:
        unit_arrays.append(F.transform(ngrams_from_tokens(toks, n), _tag(n)))
    units = df.select(doc, F.explode(F.concat(*unit_arrays)).alias("u")).select(
        "doc_id", F.col("u.order").alias("order"), F.col("u.unit").alias("unit")
    ).repartition("doc_id")
    counts = units.groupBy("doc_id", "order", "unit").agg(F.count("*").alias("c"))
    is_line = F.col("order") == 0
    aggs = [
        (
            F.sum(F.when(is_line, F.col("c") - 1))
            / F.sum(F.when(is_line, F.col("c")))
        ).alias("_dlf"),
        (
            F.sum(F.when(is_line, (F.col("c") - 1) * F.length("unit")))
            / F.sum(F.when(is_line, F.col("c") * F.length("unit")))
        ).alias("_dlcf"),
    ]
    for n in top_ngram_orders:
        # min(struct(-c, gram)) == (max count, then SMALLEST gram) — the
        # deterministic engine-portable tie-break, without a self-join
        aggs.append(
            F.min(
                F.when(
                    F.col("order") == n,
                    F.struct(
                        (-F.col("c")).alias("negc"), F.col("unit").alias("gram")
                    ),
                )
            ).alias(f"_top{n}")
        )
    per_doc = counts.groupBy("doc_id").agg(*aggs)
    out = df.select(doc, F.length(text_col).alias("n_chars")).join(
        per_doc, "doc_id", "left"
    )
    sel = [
        "doc_id",
        F.coalesce("_dlf", F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce("_dlcf", F.lit(0.0)).alias("dup_line_char_frac"),
    ]
    for n in top_ngram_orders:
        topchars = (-F.col(f"_top{n}.negc")) * F.length(F.col(f"_top{n}.gram"))
        sel.append(
            F.when(
                F.col("n_chars") > 0,
                F.coalesce(topchars, F.lit(0)) / F.col("n_chars"),
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
