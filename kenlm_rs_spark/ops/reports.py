"""Corpus report: the per-(language, source) accounting table every
training-data pipeline publishes next to its output — docs, token mass,
char stats, exact-dup pressure — one groupBy over the corpus.

Scale notes (100 TB):
- one shuffle on (lang, source) — low cardinality, every partial
  aggregate combines map-side; no skew risk because the GROUP is the
  output row, not a join key;
- ``distinct_fingerprints`` is exact here (the DuckDB oracle needs exact);
  at 10^12 docs swap in ``approx_count_distinct`` (HLL, fixed-size state)
  — the one-line change is noted inline;
- per-DOMAIN variants of this table go through the salted two-level
  aggregation in ops/partitioning.py instead (domains ARE Zipf-skewed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import TOKEN_SPLIT, token_count


def corpus_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """(group..., n_docs, total_tokens, avg_chars, distinct_fingerprints)."""
    fingerprint = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT, " ")
    )
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col(text_col)).cast("long")).alias("total_tokens"),
            F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
            # swap for F.approx_count_distinct at 10^12 docs (HLL)
            F.countDistinct(fingerprint).alias("distinct_fingerprints"),
        )
    )
