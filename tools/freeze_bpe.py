"""Freeze the BPE oracle fixtures: run the SEQUENTIAL reference trainer
(ops/bpe.bpe_train_py — pure Python, no Spark) over the sf0.01 documents and
write the merge table to fixtures/oracle/sf0.01/bpe_merges.parquet, plus the
per-document segmentation produced by the sequential segmenter
(ops/bpe.bpe_segment_py) to bpe_segments.parquet (doc_id, n_subwords,
seg_md5 = md5 of the \\x1f-joined subword stream). The driver's gates then
hash-compare the DISTRIBUTED Spark trainer AND the Arrow segmenter against
this independent implementation — the same cross-implementation pattern as
the frozen sequential LM scores (tools/freeze_oracle.py).

Tokenization mirrors ops/textstats.TOKEN_SPLIT (the reference's corpus
delimiters, corpus_count.cc:241-246) via Python re.

Usage: python tools/freeze_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from kenlm_rs_spark.ops.bpe import bpe_segment_py, bpe_train_py

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
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts = docs.column("text").to_pylist()
    doc_ids = docs.column("doc_id").to_pylist()
    wc: dict[str, int] = {}
    for text in texts:
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

    # per-document segmentation with the sequential segmenter (memoized per
    # distinct word, like the Spark Arrow stage)
    seg_cache: dict[str, list[str]] = {}
    n_sub: list[int] = []
    seg_md5: list[str] = []
    for text in texts:
        subs: list[str] = []
        for w in _SPLIT.split(text):
            if not w:
                continue
            hit = seg_cache.get(w)
            if hit is None:
                seg_cache[w] = hit = bpe_segment_py(w, merges)
            subs.extend(hit)
        n_sub.append(len(subs))
        seg_md5.append(hashlib.md5("\x1f".join(subs).encode("utf-8")).hexdigest())
    seg_table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_subwords": pa.array(n_sub, pa.int64()),
            "seg_md5": pa.array(seg_md5, pa.string()),
        }
    )
    out2 = os.path.join(out_dir, "bpe_segments.parquet")
    pq.write_table(seg_table, out2)
    print(f"wrote {out2} ({len(doc_ids)} docs, {len(seg_cache)} distinct words)")


if __name__ == "__main__":
    main()
