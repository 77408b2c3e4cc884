"""Benchmark decontamination: flag training documents that share verbatim
n-grams with an evaluation/benchmark set (the standard contamination guard
in LLM data pipelines — e.g. GPT-3's 13-gram and PaLM's 8-gram overlap
rules; n is a parameter here because the test corpus is short-document).

Scale shape: the benchmark side is tiny by construction (eval sets are
thousands of documents, the corpus is 10^12) -> its distinct n-gram set is
BROADCAST; the corpus side never shuffles at all — each partition hash-joins
its exploded n-grams against the broadcast set and aggregates per doc
map-side. One narrow pass over the corpus, no exchange of corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import ngrams_col


def benchmark_ngrams(benchmark: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct n-grams of the benchmark set (the broadcast side)."""
    return (
        benchmark.select(F.explode(ngrams_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_matches: int = 1,
    bench_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_matched, contaminated) for every document: n_matched =
    how many DISTINCT benchmark n-grams the doc contains; contaminated iff
    n_matched >= min_matches. ``bench_text_col`` defaults to ``text_col``."""
    bench = benchmark_ngrams(benchmark, bench_text_col or text_col, n)
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(ngrams_col(F.col(text_col), n))).alias("gram"),
    )
    matched = (
        doc_grams.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) >= min_matches).alias("contaminated"),
        )
    )
