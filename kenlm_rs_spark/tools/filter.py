"""filter twin (/root/reference/src/cxx/lm/filter/filter_main.cc:24-52).

Modes: copy | single | multiple | union, with optional ``--context`` (only
the context must pass) and ``--phrase`` (vocab lines are tab-delimited
phrases assembled per phrase.hh). The vocabulary comes from --vocab-file
(one sentence's vocabulary per line, as in the reference) or --words.

  python -m kenlm_rs_spark.tools.filter single --model in.arpa \
      --words "the a of" --output out.arpa [--context] [--phrase]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["copy", "single", "multiple", "union"])
    ap.add_argument("--model", required=True, help="input ARPA")
    ap.add_argument("--output", required=True,
                    help="output ARPA (multiple mode: one file per sentence id, "
                         "suffixed .<id>)")
    ap.add_argument("--vocab-file", help="vocabulary file (one sentence per line)")
    ap.add_argument("--words", help="inline single-sentence vocabulary")
    ap.add_argument("--context", action="store_true")
    ap.add_argument("--phrase", action="store_true")
    ap.add_argument("--master", default="local[4]")
    args = ap.parse_args(argv)

    import io

    from ..builder.filter import (
        arpa_to_df,
        context_filter,
        df_to_sections,
        multiple_output_filter,
        union_filter,
        vocab_filter,
    )
    from ..builder.phrase_filter import phrase_filter
    from ..lm.arpa import read_arpa, write_arpa
    from ..spark.session import get_spark

    sections = read_arpa(args.model)

    def emit(sections_out, path):
        buf = io.StringIO()
        write_arpa(sections_out, buf)
        with open(path, "w") as f:
            f.write(buf.getvalue())

    if args.mode == "copy":
        emit(sections, args.output)
        print(f"wrote {args.output}", file=sys.stderr)
        return

    if args.vocab_file:
        lines = [ln.rstrip("\n") for ln in open(args.vocab_file) if ln.strip()]
    elif args.words is not None:
        lines = [args.words]
    else:
        raise SystemExit("need --vocab-file or --words")

    from pyspark.sql import SparkSession

    owned = SparkSession.getActiveSession() is None
    spark = get_spark("kenlm-filter", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    ngrams = arpa_to_df(spark, sections)

    def one(line):
        if args.phrase:
            return phrase_filter(ngrams, line)
        vocab = line.split()
        if args.context:
            return context_filter(ngrams, vocab)
        return vocab_filter(ngrams, vocab)

    if args.mode == "single":
        emit(df_to_sections(one(lines[0])), args.output)
        outs = [args.output]
    elif args.mode == "union":
        if args.phrase or args.context:
            out = None
            for ln in lines:
                part = one(ln)
                out = part if out is None else out.unionByName(part)
            out = out.distinct()
        else:
            out = union_filter(ngrams, [ln.split() for ln in lines])
        emit(df_to_sections(out), args.output)
        outs = [args.output]
    else:  # multiple: one output per sentence line (reference: %d in name)
        outs = []
        if args.phrase or args.context:
            for i, ln in enumerate(lines):
                path = f"{args.output}.{i}"
                emit(df_to_sections(one(ln)), path)
                outs.append(path)
        else:
            fanned = multiple_output_filter(
                ngrams, {str(i): ln.split() for i, ln in enumerate(lines)}
            )
            for i in range(len(lines)):
                path = f"{args.output}.{i}"
                emit(
                    df_to_sections(
                        fanned.filter(fanned.sentence_id == str(i)).drop("sentence_id")
                    ),
                    path,
                )
                outs.append(path)
    print(f"wrote {' '.join(outs)}", file=sys.stderr)
    if owned:  # never tear down a session the caller owns (e.g. tests)
        spark.stop()


if __name__ == "__main__":
    main()
