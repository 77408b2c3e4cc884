"""Sequence packing (ops/packing.py): the two-level distributed prefix sum
must equal the naive global cumsum exactly, boundary/empty docs get
well-defined sequences, and the report aggregates correctly."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.packing import pack_sequences, packing_report


def _mk(spark, counts):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tokens long"
    )


def _naive(counts, seq_len):
    out, off = [], 0
    for i, n in enumerate(counts):
        span_end = off + max(n, 1) - 1
        first, last = off // seq_len, span_end // seq_len
        out.append((i, n, off, first, last, last - first + 1))
        off += n
    return out


@pytest.mark.parametrize("shard_size", [1, 3, 7, 1000])
def test_matches_naive_cumsum(spark, shard_size):
    counts = [5, 0, 17, 3, 3, 128, 1, 64, 0, 2, 200, 9]
    got = sorted(
        tuple(r)
        for r in pack_sequences(
            _mk(spark, counts), seq_len=32, shard_size=shard_size
        ).collect()
    )
    assert got == sorted(_naive(counts, 32))


def test_boundary_and_empty_docs(spark):
    # doc1 spans the 8-token boundary; doc2 is empty at offset 10
    counts = [10, 6, 0, 1]
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(_mk(spark, counts), seq_len=8).collect()
    }
    assert rows[0]["first_seq"] == 0 and rows[0]["last_seq"] == 1
    assert rows[0]["n_seqs"] == 2
    assert rows[1]["start_offset"] == 10 and rows[1]["n_seqs"] == 1
    # empty doc: one home sequence at its offset, occupies no space
    assert rows[2]["n_seqs"] == 1 and rows[2]["first_seq"] == 2
    assert rows[3]["start_offset"] == 16


def test_report(spark):
    counts = [10, 6, 0, 1]
    packed = pack_sequences(_mk(spark, counts), seq_len=8)
    rep = packing_report(packed, seq_len=8).collect()[0]
    assert rep["n_docs"] == 4
    assert rep["total_tokens"] == 17
    assert rep["n_sequences"] == 3  # 17 tokens / 8 -> seqs 0,1,2
    assert rep["n_boundary_docs"] == 1


def test_validation(spark):
    df = _mk(spark, [1])
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=8, shard_size=0)
