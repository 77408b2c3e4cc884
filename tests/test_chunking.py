"""Sliding-window chunking (ops/chunking.py): grid law, overlap
reconstruction, short/exact/empty docs, and validation."""

import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.chunking import chunk_documents


def _doc(spark, text, doc_id=0):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_grid_law(spark):
    # 10 tokens, max 4, overlap 1 -> step 3 -> chunks at 0,3,6 cover to 10
    toks = " ".join(f"t{i}" for i in range(10))
    rows = sorted(
        (r["chunk_idx"], r["n_tokens_chunk"], r["chunk_text"])
        for r in chunk_documents(_doc(spark, toks), 4, 1).collect()
    )
    assert [r[0] for r in rows] == [0, 1, 2]
    assert rows[0][2] == "t0 t1 t2 t3"
    assert rows[1][2] == "t3 t4 t5 t6"
    assert rows[2][2] == "t6 t7 t8 t9"


def test_every_token_covered_with_overlap(spark):
    toks = " ".join(f"w{i}" for i in range(100))
    rows = chunk_documents(_doc(spark, toks), 16, 4).collect()
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"w{i}" for i in range(100)}
    # consecutive chunks share exactly `overlap` tokens
    by_idx = {r["chunk_idx"]: r["chunk_text"].split(" ") for r in rows}
    for k in range(len(by_idx) - 1):
        assert by_idx[k][-4:] == by_idx[k + 1][:4]


def test_short_exact_empty(spark):
    assert chunk_documents(_doc(spark, "a b c"), 10, 2).count() == 1
    out = chunk_documents(_doc(spark, "a b c d"), 4, 1).collect()
    assert len(out) == 1 and out[0]["n_tokens_chunk"] == 4
    assert chunk_documents(_doc(spark, "   "), 4, 1).count() == 0


def test_validates(spark):
    d = _doc(spark, "a b")
    with pytest.raises(ValueError):
        chunk_documents(d, 0)
    with pytest.raises(ValueError):
        chunk_documents(d, 4, 4)
