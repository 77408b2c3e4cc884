"""Package kenlm_rs_spark into a --py-files zip (the cluster launch artifact
of the north rule: `spark-submit --py-files kenlm_rs_spark.zip ...`).

Usage: python tools/package_pyfiles.py [out.zip]   (default dist/kenlm_rs_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "kenlm_rs_spark")
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    os.replace(tmp, out_path)
    return out_path


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "kenlm_rs_spark.zip")
    print(build_zip(out))


if __name__ == "__main__":
    main()
