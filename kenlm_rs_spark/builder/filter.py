"""ARPA filter subsystem (SURVEY.md §2.2, reference
/root/reference/src/cxx/lm/filter/): keep only n-grams whose words pass a
vocabulary predicate, as DataFrame plans over an n-gram table.

The n-gram table shape is (order int, ngram array<string>, log_prob float,
backoff float) — the DataFrame rendering of parsed ARPA sections (S1/S8).
Vocabularies are small (query-time word lists) -> broadcast joins; the n-gram
table is the big side and is only scanned, never shuffled, for F1/F2/F4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lm.arpa import ArpaSections


def arpa_to_df(spark: SparkSession, sections: ArpaSections) -> DataFrame:
    """Parsed ARPA -> DataFrame (order, ngram, log_prob, backoff)."""
    rows = []
    for o, recs in enumerate(sections.backoffs, start=1):
        for r in recs:
            rows.append((o, list(r.ngram), float(r.log_prob), float(r.backoff)))
    for r in sections.no_backoff:
        rows.append((sections.order, list(r.ngram), float(r.log_prob), None))
    return spark.createDataFrame(
        rows, "order int, ngram array<string>, log_prob float, backoff float"
    )


def df_to_sections(df: DataFrame) -> ArpaSections:
    """Collect a (small, model-sized) filtered n-gram table back to sections,
    with recomputed counts — the ARPA writer sink (S8)."""
    from ..lm.arpa import ProbBackoffNgram, ProbNgram

    rows = df.collect()
    max_order = max(r["order"] for r in rows) if rows else 0
    sections = ArpaSections(counts=[0] * max_order)
    sections.backoffs = [[] for _ in range(max_order - 1)]
    for r in sorted(rows, key=lambda r: (r["order"], r["ngram"])):
        o = r["order"]
        sections.counts[o - 1] += 1
        if o == max_order:
            sections.no_backoff.append(ProbNgram(r["log_prob"], tuple(r["ngram"])))
        else:
            sections.backoffs[o - 1].append(
                ProbBackoffNgram(
                    r["log_prob"], tuple(r["ngram"]),
                    r["backoff"] if r["backoff"] is not None else -0.0,
                )
            )
    return sections


def vocab_filter(ngrams: DataFrame, vocab: list[str] | set[str]) -> DataFrame:
    """F1 (single-vocab mode, filter/vocab.cc): keep an n-gram iff EVERY word
    is in the vocabulary. <s>/</s>/<unk> are always admitted, matching the
    filter tool's treatment of structural symbols."""
    allowed = sorted(set(vocab) | {"<s>", "</s>", "<unk>"})
    return ngrams.filter(
        F.forall(F.col("ngram"), lambda w: w.isin(*allowed))
    )


def context_filter(ngrams: DataFrame, vocab: list[str] | set[str]) -> DataFrame:
    """F2 (filter_main.cc:33-34): only the context (all but the last word)
    must pass; the whole n-gram is output."""
    allowed = sorted(set(vocab) | {"<s>", "</s>", "<unk>"})
    ctx = F.slice(F.col("ngram"), 1, F.size(F.col("ngram")) - 1)
    return ngrams.filter(F.forall(ctx, lambda w: w.isin(*allowed)))


def union_filter(ngrams: DataFrame, vocabs: list[list[str]]) -> DataFrame:
    """F4 (filter_main.cc:31-32): single output = n-grams passing ANY of the
    per-sentence vocabularies."""
    out = None
    for v in vocabs:
        part = vocab_filter(ngrams, v)
        out = part if out is None else out.unionByName(part)
    return out.distinct() if out is not None else ngrams.limit(0)


def multiple_output_filter(
    ngrams: DataFrame, vocabs: dict[str, list[str]]
) -> DataFrame:
    """F3 (filter_main.cc:28-30): per-sentence vocabularies -> one filtered
    set per key, fanned out as a `sentence_id` column (write with
    partitionBy('sentence_id') for the reference's one-file-per-sentence
    output shape)."""
    spark = ngrams.sparkSession
    rows = [
        (k, sorted(set(v) | {"<s>", "</s>", "<unk>"})) for k, v in vocabs.items()
    ]
    vdf = spark.createDataFrame(rows, "sentence_id string, allowed array<string>")
    joined = ngrams.crossJoin(F.broadcast(vdf))
    return joined.filter(
        F.forall(F.col("ngram"), lambda w: F.array_contains(F.col("allowed"), w))
    ).drop("allowed")
