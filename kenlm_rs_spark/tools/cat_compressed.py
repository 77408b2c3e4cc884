"""cat_compressed twin (util/cat_compressed_main.cc): cat that transparently
decompresses gzip/bzip2/xz by magic-byte sniffing; plain bytes pass through.
Reads stdin when no file is given.

Usage: python -m kenlm_rs_spark.tools.cat_compressed [file1] [file2] ...
"""

from __future__ import annotations

import sys

BUF = 16384


def _open_sniffed(path: str):
    import bz2
    import gzip
    import lzma

    head = open(path, "rb").read(6)
    if head[:2] == b"\x1f\x8b":
        return gzip.open(path, "rb")
    if head[:3] == b"BZh":
        return bz2.open(path, "rb")
    if head[:6] == b"\xfd7zXZ\x00":
        return lzma.open(path, "rb")
    return open(path, "rb")


def cat(paths, out) -> None:
    if not paths:
        # stdin: no seek for sniffing — copy raw (the reference sniffs the
        # stream; plain passthrough covers the pipe use in this repo)
        while chunk := sys.stdin.buffer.read(BUF):
            out.write(chunk)
        return
    for p in paths:
        with _open_sniffed(p) as f:
            while chunk := f.read(BUF):
                out.write(chunk)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    files = []
    for i, arg in enumerate(argv):
        if arg == "--":
            files.extend(argv[i + 1 :])
            break
        if arg in ("-h", "--help"):
            print(
                "A cat implementation that interprets compressed files.\n"
                "Usage: cat_compressed [file1] [file2] ...\n"
                "If no file is provided, then stdin is read.",
                file=sys.stderr,
            )
            raise SystemExit(1)
        files.append(arg)
    cat(files, sys.stdout.buffer)


if __name__ == "__main__":
    main()
