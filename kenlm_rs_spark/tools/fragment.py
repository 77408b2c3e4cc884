"""fragment twin (lm/fragment_main.cc): score each stdin line as a sentence
FRAGMENT — no <s> context, no </s> — printing one total log10 probability
per line.

The reference drives RuleScore<Model>::Terminal over a ChartState; for a
terminal-only rule starting from the null context that telescopes to the
plain left-to-right chain p(w1) * p(w2 | w1) * ... (left.hh's ExtendLeft
calls collapse to ordinary lookups when there is no nonterminal to extend),
i.e. exactly score_sentence(words, bos=False, eos=False). Rest-cost models
(REST_PROBING), where fragment edges are charged differently, are out of
scope (SURVEY §7) and rejected at load.

Usage: python -m kenlm_rs_spark.tools.fragment model.[bin|arpa] < fragments
"""

from __future__ import annotations

import sys


def main(argv=None, stdin=None, stdout=None):
    argv = argv if argv is not None else sys.argv[1:]
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    if len(argv) != 1:
        print("Expected model file name.", file=sys.stderr)
        raise SystemExit(1)

    from ..lm.model import NGramModel

    model = NGramModel.load(argv[0])
    for line in stdin:
        words = line.split()
        stdout.write(f"{model.score_sentence(words, False, False)}\n")


if __name__ == "__main__":
    main()
