"""build_binary twin (/root/reference/src/cxx/lm/build_binary_main.cc:25-55).

ARPA -> KenLM binary. Type is probing (default) or trie; -q/-b turn on
quantization (trie only), -a turns on bhiksha array pointer compression
(trie only) — flag semantics copied from the reference usage string.

  python -m kenlm_rs_spark.tools.build_binary [-p mult] [-q bits] [-b bits]
      [-a bits] [type] input.arpa output.bin
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-p", type=float, default=1.5, dest="probing_multiplier",
                    help="probing hash table space multiplier (>= 1.0)")
    ap.add_argument("-q", type=int, default=None, dest="quant_bits",
                    help="quantization on, probability bits (trie only)")
    ap.add_argument("-b", type=int, default=None, dest="backoff_bits",
                    help="backoff quantization bits (requires -q; defaults to it)")
    ap.add_argument("-a", type=int, default=None, dest="bhiksha_bits",
                    help="bhiksha array pointer compression, max chopped bits (trie only)")
    ap.add_argument("rest", nargs="+",
                    help="[probing|trie] input.arpa output.bin")
    args = ap.parse_args(argv)

    rest = list(args.rest)
    model_type = "probing"
    if rest and rest[0] in ("probing", "trie"):
        model_type = rest.pop(0)
    if len(rest) != 2:
        raise SystemExit("expected: [probing|trie] input.arpa output.bin")
    arpa_in, bin_out = rest

    from ..lm.arpa import read_arpa
    from ..lm.binwrite import write_probing, write_trie

    sections = read_arpa(arpa_in)
    if model_type == "probing":
        if args.quant_bits or args.bhiksha_bits is not None:
            raise SystemExit("-q/-a apply to the trie type only (as in the reference)")
        write_probing(sections, bin_out, probing_multiplier=args.probing_multiplier)
    else:
        quant = None
        if args.quant_bits:
            quant = (args.quant_bits, args.backoff_bits or args.quant_bits)
        write_trie(
            sections, bin_out, quant_bits=quant, bhiksha_bits=args.bhiksha_bits,
            probing_multiplier=args.probing_multiplier,
        )
    print(f"wrote {bin_out} ({model_type})", file=sys.stderr)


if __name__ == "__main__":
    main()
