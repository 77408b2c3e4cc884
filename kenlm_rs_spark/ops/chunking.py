"""Sliding-window document chunking: split long documents into
max_tokens-sized windows with a fixed token overlap — the preparation
step for embedding models / retrieval indexing (every RAG pipeline) and
for per-chunk scoring of documents beyond a model's context.

Chunk grid (pure integer arithmetic, so the SQL twin is exact):
  step      = max_tokens - overlap
  n_chunks  = 1                          if n <= max_tokens
              1 + ceil((n - max_tokens) / step)   otherwise
  chunk k   = tokens[k*step : k*step + max_tokens)   (last may be short)
Documents with zero tokens emit no chunks.

Scale shape (100 TB): tokenize once, explode the CHUNK INDEX sequence
(n/step rows per doc, not one row per token), slice per row — a narrow
map, no shuffle, no Python. The slice runs on a materialized array column
per exploded row (NOT inside a higher-order-function lambda, which would
re-inline the array expression per element — the Catalyst pathology in
CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.textstats import tokens_col


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunks, n_tokens_chunk, chunk_text)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}/{max_tokens}"
        )
    step = max_tokens - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    # ceil((n - max) / step) via integer `div` (never float division)
    n_chunks = F.when(F.col("_n") <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.lit(1)
        + F.expr(f"(_n - {max_tokens} + {step - 1}) div {step}").cast("long")
    )
    exploded = (
        base.filter(F.col("_n") > 0)
        .withColumn("n_chunks", n_chunks)
        .select(
            "doc_id",
            "_toks",
            "n_chunks",
            F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_idx", "_k"
            ),
        )
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * step + 1, max_tokens
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "n_chunks",
        F.size(piece).cast("long").alias("n_tokens_chunk"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
