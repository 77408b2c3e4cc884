"""Streaming n-gram counting — the Structured Streaming twin of the
lmplz CorpusCount/CombineCounts stages (builder/lmplz.py A1/A2): running
corpus-wide n-gram counts over a text stream, maintained incrementally as
micro-batches arrive.

Shape: explode n-grams per document (the same shared tokenization and
zip_with n-gram construction as the batch counter — ops/textstats), then a
streaming `groupBy(gram).count()` in UPDATE output mode. Spark maintains
the running count in the state store keyed by gram — the stream-native
form of CombineCounts' external merge: partial counts combine map-side per
micro-batch, the state store holds one row per distinct gram (vocab-sized,
not corpus-sized), and every update emits the new total for downstream
consumers (e.g. an incremental AdjustCounts refresh).

No watermark: n-gram counting has no event-time lateness semantics — a
gram is a gram whenever it arrives. For bounded state on a 10^12-doc
stream, compose with a frequency floor downstream (singletons dominate
distinct grams; the batch builder's --prune does the same) or hash grams
to xxhash64 as ops/spans does; both are noted rather than silently applied
so the stream==batch equality stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.textstats import ngrams_col


def ngram_count_stream(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(ngram, cnt) running counts over a streaming (or batch) text source.
    Use outputMode('update') (or 'complete') on the writeStream; the
    stream==batch pytest drains with availableNow and compares the final
    state against the batch groupBy on the same input."""
    return (
        docs.select(F.explode(ngrams_col(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
    )
