"""Sequence packing: concat-and-chunk documents into fixed-length training
sequences (the GPT-style pretraining layout — every document, in a canonical
order, is concatenated into one token stream which is then cut every
``seq_len`` tokens).

The operator answers, per document: where does it land in the stream
(``start_offset``), which training sequences does it touch (``first_seq`` /
``last_seq`` / ``n_seqs``)? Downstream uses: shard assignment for training
(all docs of sequence s live in shard s // seqs_per_shard), boundary
accounting (how many documents are split across a context window), and
packing-efficiency reports.

Scale design (100 TB): a naive global ``Window.orderBy(doc_id)`` cumsum is a
single-partition sort — unusable. This is the textbook two-level distributed
prefix sum instead:

1. shard = doc_id // shard_size → per-shard token subtotals (one small
   groupBy; n_shards = N / shard_size rows, MODEL-sized).
2. exclusive prefix sum over the subtotal table (a window over n_shards
   rows — the only ordered window, and it is tiny).
3. broadcast-join shard base offsets back; intra-shard exclusive cumsum with
   ``Window.partitionBy(shard).orderBy(doc_id)`` — each window partition
   holds shard_size rows regardless of corpus size, so no partition ever
   exceeds a bounded, tunable row count.

Because shard = doc_id // shard_size, ordering by (shard, doc_id) equals
ordering by doc_id: the layout is byte-identical to the naive global cumsum
(the DuckDB oracle computes exactly that).

Empty documents (0 tokens) occupy no stream space; they are reported with
``n_seqs = 1`` spanning the sequence at their offset (greatest(n,1) in the
chunk arithmetic) so every doc has a well-defined home sequence.

All arithmetic is integer (BIGINT) — engine-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_size: int = 4096,
) -> DataFrame:
    """Assign each document its packed position in the concat-and-chunk
    stream. Input needs ``id_col`` (unique, defines the canonical order) and
    ``tokens_col`` (per-doc token count). Returns
    (doc_id, n_tokens, start_offset, first_seq, last_seq, n_seqs)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")

    toks = F.col(tokens_col).cast("long")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        (F.col(id_col).cast("long") / F.lit(shard_size))
        .cast("long")
        .alias("_shard"),
    )

    # (1) per-shard subtotals — small
    totals = base.groupBy("_shard").agg(F.sum("n_tokens").alias("_shard_tok"))
    # (2) exclusive prefix over the tiny subtotal table; single-partition
    # window over n_shards rows only
    w_sh = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.select(
        "_shard",
        F.coalesce(F.sum("_shard_tok").over(w_sh), F.lit(0))
        .cast("long")
        .alias("_base"),
    )
    # (3) intra-shard exclusive cumsum; every window partition is at most
    # shard_size rows
    w_in = (
        Window.partitionBy("_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.col("_base")
        + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    ).cast("long")

    span_end = start + F.greatest(F.col("n_tokens"), F.lit(1)) - F.lit(1)
    first_seq = F.floor(start / F.lit(seq_len)).cast("long")
    last_seq = F.floor(span_end / F.lit(seq_len)).cast("long")
    return (
        base.join(F.broadcast(bases), "_shard")
        .select(
            "doc_id",
            "n_tokens",
            start.alias("start_offset"),
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            (last_seq - first_seq + F.lit(1)).alias("n_seqs"),
        )
    )


def packing_report(packed: DataFrame, seq_len: int) -> DataFrame:
    """Corpus-level packing statistics from ``pack_sequences`` output:
    total docs/tokens/sequences, number of documents split across a
    sequence boundary, and fill ratio of the final (partial) sequence.
    One scalar aggregation — no added shuffle beyond the agg itself."""
    return packed.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.floor(
                (F.max(F.col("start_offset") + F.col("n_tokens")) - 1)
                / F.lit(seq_len)
            )
            + 1
        )
        .cast("long")
        .alias("n_sequences"),
        F.sum((F.col("n_seqs") > 1).cast("long")).alias("n_boundary_docs"),
    )
