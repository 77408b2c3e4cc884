"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning..." §2.2) — the other canonical web-filter rule set next
to Gopher (ops/gopher.py):

line level: keep a line only if it ends in a terminal punctuation mark,
has at least ``min_words`` words, and does not mention javascript;
page level: drop any page containing "lorem ipsum" or a curly brace, or
whose kept lines carry fewer than ``min_sentences`` sentence-final marks.
(The paper's bad-words list and its 3-sentence-span dedup are separate
concerns here: a blocklist is a data file, and span dedup is
ops/spans.duplicated_span_stats / ops/paragraphs.paragraph_dedup.)

Everything is a codegen/HOF expression over an array<string> lines column
— no Python, no shuffle (plan-asserted in tests); the lambdas reference
only scalar columns and lambda variables, so the Catalyst
inlining-of-expensive-array-exprs pathology (CLAUDE.md) does not apply.
The SQL twin renders the same shared constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared constants (Spark + DuckDB render the SAME strings)
TERMINAL_PUNCT_RE = '[.!?"]$'
SENTENCE_MARK_RE = "[.!?]"
JS_MARKER = "javascript"
LOREM_MARKER = "lorem ipsum"
BRACE_MARKER = "{"
C4_MIN_WORDS = 3
C4_MIN_SENTENCES = 5


def c4_kept_lines(lines: Column, min_words: int = C4_MIN_WORDS) -> Column:
    return F.filter(
        lines,
        lambda l: l.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(l, " ")) >= min_words)
        & ~F.lower(l).contains(JS_MARKER),
    )


def c4_page_stats(
    df: DataFrame,
    lines_col: str = "lines",
    id_col: str = "doc_id",
    min_words: int = C4_MIN_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """(doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
    c4_keep, drop_reason) — the full C4 page decision with first-match
    drop-reason precedence lorem_ipsum > curly_brace > too_few_sentences."""
    lines = F.col(lines_col)
    kept = c4_kept_lines(lines, min_words)
    n_sentences = F.aggregate(
        kept,
        F.lit(0),
        lambda acc, l: acc + F.regexp_count(l, F.lit(SENTENCE_MARK_RE)),
    )
    has_lorem = F.exists(lines, lambda l: F.lower(l).contains(LOREM_MARKER))
    has_brace = F.exists(lines, lambda l: l.contains(BRACE_MARKER))
    reason = (
        F.when(has_lorem, F.lit("lorem_ipsum"))
        .when(has_brace, F.lit("curly_brace"))
        .when(n_sentences < min_sentences, F.lit("too_few_sentences"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        reason.isNull().alias("c4_keep"),
        reason.alias("drop_reason"),
    )


def _q(s: str) -> str:
    return s.replace("'", "''")


def c4_page_stats_sql_exprs(lines_expr: str) -> dict[str, str]:
    """The SAME rule chain as DuckDB SQL fragments over a list-of-varchar
    expression (shared constants; list lambdas mirror the Spark HOFs)."""
    kept = (
        f"list_filter({lines_expr}, l -> "
        f"regexp_matches(l, '{_q(TERMINAL_PUNCT_RE)}') "
        f"AND len(string_split(l, ' ')) >= {C4_MIN_WORDS} "
        f"AND NOT contains(lower(l), '{_q(JS_MARKER)}'))"
    )
    n_sentences = (
        f"coalesce(list_sum(list_transform({kept}, "
        f"l -> len(regexp_extract_all(l, '{_q(SENTENCE_MARK_RE)}')))), 0)"
    )
    has_lorem = (
        f"len(list_filter({lines_expr}, "
        f"l -> contains(lower(l), '{_q(LOREM_MARKER)}'))) > 0"
    )
    has_brace = (
        f"len(list_filter({lines_expr}, l -> contains(l, '{BRACE_MARKER}'))) > 0"
    )
    return {
        "kept": kept,
        "n_sentences": n_sentences,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
    }
