"""phrase_table_vocab twin (lm/filter/phrase_table_vocab_main.cc): source
text file on the command line, phrase table ("source ||| target ||| ...")
on stdin; prints one line per source sentence containing that sentence's
vocabulary — its own words plus target words of every table entry whose
source phrase (length <= 7) occurs in the sentence.

Words per line are printed SORTED (the reference iterates an unordered hash
set, so its order is unspecified; sorting is the deterministic rendering of
the same set).

Usage: python -m kenlm_rs_spark.tools.phrase_table_vocab source.txt < table
"""

from __future__ import annotations

import sys


def main(argv=None, stdin=None, stdout=None):
    argv = argv if argv is not None else sys.argv[1:]
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    if len(argv) != 1:
        print("Expected source text on the command line", file=sys.stderr)
        raise SystemExit(1)

    from pyspark.sql import SparkSession

    from ..builder.phrase_vocab import phrase_table_vocab
    from ..spark.session import get_spark

    owned = SparkSession.getActiveSession() is None
    spark = get_spark("phrase_table_vocab")
    spark.sparkContext.setLogLevel("ERROR")

    sentences = [
        (i, line.rstrip("\n")) for i, line in enumerate(open(argv[0]))
    ]
    rows = []
    for line in stdin:
        fields = line.rstrip("\n").split("|||")
        if len(fields) >= 2:
            rows.append((fields[0], fields[1]))
    sdf = spark.createDataFrame(sentences, "sentence_id long, text string")
    tdf = spark.createDataFrame(rows or [("", "")], "source string, target string")

    out = {
        r["sentence_id"]: r["words"]
        for r in phrase_table_vocab(sdf, tdf).collect()
    }
    for i, _ in sentences:
        stdout.write(" ".join(out.get(i, [])) + "\n")
    if owned:
        spark.stop()


if __name__ == "__main__":
    main()
