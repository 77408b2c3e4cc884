"""query twin (/root/reference/src/cxx/lm/query_main.cc + ngram_query.hh).

Reads sentences from stdin (or --sentences), prints per-word
``word=vocab_id ngram_length log10_prob`` lines plus per-sentence and total
summaries, exactly in the reference tool's shape. ``-n`` disables </s>,
``-b`` disables <s> context (flag letters per query_main.cc:13-24).

  echo "looking on a little" | python -m kenlm_rs_spark.tools.query lm.arpa
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None, stdin=None, stdout=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("lm_file")
    ap.add_argument("-b", action="store_true", dest="no_bos",
                    help="do not wrap the input in <s> context")
    ap.add_argument("-n", action="store_true", dest="no_eos",
                    help="do not score </s>")
    ap.add_argument("--sentences", nargs="*", default=None,
                    help="score these instead of stdin")
    args = ap.parse_args(argv)
    stdin = stdin if stdin is not None else sys.stdin
    out = stdout if stdout is not None else sys.stdout

    import numpy as np

    from ..lm.model import NGramModel

    model = NGramModel.load(args.lm_file)
    lines = args.sentences if args.sentences is not None else stdin
    total = np.float32(0.0)
    total_oov = 0
    tokens = 0
    oov_tokens = 0
    oov_cost = np.float32(0.0)
    for line in lines:
        words = line.split()
        state = model.null_state() if args.no_bos else model.bos_state()
        sent = np.float32(0.0)
        oov = 0
        for w in words:
            idx = model.get_word_idx(w)
            if idx == 0:
                oov += 1
            prob, state, ngram_length, _ = model.full_score(state, idx)
            sent = np.float32(sent + np.float32(prob))
            tokens += 1
            if idx == 0:
                oov_tokens += 1
                oov_cost = np.float32(oov_cost + np.float32(prob))
            out.write(f"{w}={idx} {ngram_length} {prob:.7f}\t")
        if not args.no_eos:
            prob, state, ngram_length, _ = model.full_score(state, model.eos_id)
            sent = np.float32(sent + np.float32(prob))
            tokens += 1
            out.write(f"</s>={model.eos_id} {ngram_length} {prob:.7f}\t")
        out.write(f"Total: {sent:.7f} OOV: {oov}\n")
        total = np.float32(total + sent)
        total_oov += oov
    # summary block per ngram_query.hh:96-99 (10^(-sum / tokens))
    if tokens:
        ppl_incl = 10.0 ** (-float(total) / tokens)
        out.write(f"Perplexity including OOVs:\t{ppl_incl}\n")
        if tokens - oov_tokens:
            ppl_excl = 10.0 ** (
                -(float(total) - float(oov_cost)) / (tokens - oov_tokens)
            )
            out.write(f"Perplexity excluding OOVs:\t{ppl_excl}\n")
        out.write(f"OOVs:\t{total_oov}\n")
        out.write(f"Tokens:\t{tokens}\n")


if __name__ == "__main__":
    main()
