"""count_ngrams twin: count order-N n-grams from a corpus and write the
reference's on-disk pair — a binary counts file of records
[order x u32 word-id][u64 count] plus a null-delimited vocabulary list in id
order (reference: lm/builder/count_ngrams_main.cc — stdin corpus -> sorted
count records; lm/common/print.hh VocabReconstitute reads the list back).

Differences, documented: word ids here are assigned deterministically by
(count desc, word asc) over the unigram distribution instead of single-thread
first-seen order (ids are a private index shared by the two files — any
consistent assignment reconstitutes identically); records are written in
suffix order (last word major), like the reference's SuffixOrder sort.
Counting runs as a Spark plan (groupBy = the reference's sort+combine chain);
the emit streams through the driver with toLocalIterator, nothing
corpus-sized is collected.

Usage:
  python -m kenlm_rs_spark.tools.count_ngrams --order 3 --text corpus.txt \
      --counts out.counts --write_vocab_list out.vocab
"""

from __future__ import annotations

import argparse
import os
import struct
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--order", "-o", type=int, required=True)
    ap.add_argument("--text", required=True, help=".txt or parquet with a text column")
    ap.add_argument("--counts", required=True, help="binary counts output")
    ap.add_argument("--write_vocab_list", required=True,
                    help="null-delimited vocabulary list output (id order)")
    ap.add_argument("--text_col", default="text")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ..builder.lmplz import raw_window_counts
    from ..spark.session import get_spark

    owned = SparkSession.getActiveSession() is None
    spark = get_spark("count_ngrams", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    if args.text.endswith(".txt"):
        df = spark.read.text(args.text).withColumnRenamed("value", args.text_col)
    else:
        df = spark.read.parquet(args.text)

    raw = raw_window_counts(df, args.text_col, args.order)
    full = raw.filter(F.col("n") == args.order).persist()

    # vocabulary = every word appearing in any full window, ids by
    # (occurrence count desc, word asc) — model-sized, collected once
    words = (
        full.select(F.explode("gram").alias("w"), "count")
        .groupBy("w")
        .agg(F.sum("count").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .collect()
    )
    word_id = {r["w"]: i for i, r in enumerate(words)}

    tmp_v = args.write_vocab_list + ".tmp"
    with open(tmp_v, "wb") as f:
        for r in words:
            f.write(r["w"].encode("utf-8") + b"\x00")
    os.replace(tmp_v, args.write_vocab_list)

    # suffix order: compare the last word first (common/compare.hh
    # SuffixOrder) — sort on the reversed gram, then stream out
    rev = full.withColumn("_rev", F.reverse("gram")).orderBy("_rev")
    tmp_c = args.counts + ".tmp"
    n_records = 0
    with open(tmp_c, "wb") as f:
        for row in rev.toLocalIterator(prefetchPartitions=True):
            ids = [word_id[w] for w in row["gram"]]
            f.write(struct.pack(f"<{args.order}IQ", *ids, int(row["count"])))
            n_records += 1
    os.replace(tmp_c, args.counts)
    full.unpersist()
    print(
        f"wrote {n_records} records to {args.counts}, "
        f"{len(words)} words to {args.write_vocab_list}",
        file=sys.stderr,
    )
    if owned:
        spark.stop()


if __name__ == "__main__":
    main()
