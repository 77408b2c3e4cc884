"""Freeze the BPE-merge oracle fixture: run the SEQUENTIAL reference trainer
(ops/bpe.bpe_train_py — pure Python, no Spark) over the sf0.01 documents and
write the merge table to fixtures/oracle/sf0.01/bpe_merges.parquet. The
driver's gate then hash-compares the DISTRIBUTED Spark trainer against this
independent implementation — the same cross-implementation pattern as the
frozen sequential LM scores (tools/freeze_oracle.py).

Tokenization mirrors ops/textstats.TOKEN_SPLIT (the reference's corpus
delimiters, corpus_count.cc:241-246) via Python re.

Usage: python tools/freeze_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from kenlm_rs_spark.ops.bpe import bpe_train_py

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_MERGES = 12
_SPLIT = re.compile("[\x00\t\n\r ]+")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else N_MERGES
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(REPO, "fixtures", "oracle", sf_name)
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    wc: dict[str, int] = {}
    for text in docs.column("text").to_pylist():
        for w in _SPLIT.split(text):
            if w:
                wc[w] = wc.get(w, 0) + 1

    merges = bpe_train_py(wc, n_merges)
    table = pa.table(
        {
            "merge_rank": pa.array(range(1, len(merges) + 1), pa.int64()),
            "lhs": pa.array([m[0] for m in merges], pa.string()),
            "rhs": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )
    out = os.path.join(out_dir, "bpe_merges.parquet")
    pq.write_table(table, out)
    print(f"wrote {out} ({len(merges)} merges from {len(wc)} distinct words)")


if __name__ == "__main__":
    main()
