"""interpolate twin (reference lm/interpolate — the weighted static-merge
half; lambda TUNING is out of scope per SURVEY §7): merge K ARPA models
with fixed weights into one normalized ARPA (J2 k-way merge + J3 vocab
union + bottom-up backoff re-solve, builder/interpolate.py).

  python -m kenlm_rs_spark.tools.interpolate \
      --models a.arpa b.arpa --weights 0.6 0.4 --output merged.arpa
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", nargs="+", required=True)
    ap.add_argument("--weights", nargs="+", type=float, required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)
    if len(args.models) != len(args.weights):
        raise SystemExit("need one weight per model")

    import io
    import os

    from ..builder.interpolate import interpolate_models
    from ..lm.arpa import write_arpa
    from ..lm.model import NGramModel

    models = [NGramModel.load(p) for p in args.models]
    sections = interpolate_models(models, args.weights)
    buf = io.StringIO()
    write_arpa(sections, buf)
    tmp = args.output + ".tmp"
    with open(tmp, "w") as f:
        f.write(buf.getvalue())
    os.replace(tmp, args.output)
    if getattr(sections, "clamped_contexts", None):
        print(
            f"warning: {len(sections.clamped_contexts)} denormalized "
            "context(s) clamped", file=sys.stderr,
        )
    print(f"wrote {args.output} counts={sections.counts}", file=sys.stderr)


if __name__ == "__main__":
    main()
