"""dump_counts twin: print a binary n-gram counts file as text
("w1 w2 ... wN count" per line), resolving word ids against a null-delimited
vocabulary list (reference: lm/builder/dump_counts_main.cc — record format
[order x u32 id][u64 count], VocabReconstitute over the mmapped vocab file;
ids >= vocab size are a hard error with the same diagnostic).

Pure file I/O — no Spark session. Usage (positional, like the reference):
  python -m kenlm_rs_spark.tools.dump_counts counts vocab order
"""

from __future__ import annotations

import struct
import sys


def dump(counts_path: str, vocab_path: str, order: int, out=None) -> int:
    out = out or sys.stdout
    with open(vocab_path, "rb") as f:
        blob = f.read()
    # null-delimited, id order; trailing null terminates the last word
    vocab = blob.decode("utf-8").split("\x00")
    if vocab and vocab[-1] == "":
        vocab.pop()
    rec = struct.Struct(f"<{order}IQ")
    n = 0
    with open(counts_path, "rb") as f:
        while True:
            chunk = f.read(rec.size)
            if not chunk:
                break
            if len(chunk) != rec.size:
                raise ValueError(
                    f"Read {len(chunk)} bytes at the end of file, which is not "
                    f"a complete record of length {rec.size}"
                )
            *ids, count = rec.unpack(chunk)
            for i in ids:
                if i >= len(vocab):
                    raise ValueError(
                        f"Vocab ID {i} is larger than the vocab file's maximum "
                        f"of {len(vocab)}. Are you sure you have the right "
                        "order and vocab file for these counts?"
                    )
            out.write(" ".join(vocab[i] for i in ids) + f" {count}\n")
            n += 1
    return n


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print(
            "Usage: dump_counts counts vocabulary order\n"
            "The counts file contains records with 4-byte vocabulary ids "
            "followed by 8-byte counts. The vocabulary file contains the "
            "words delimited by NULL in order of id.",
            file=sys.stderr,
        )
        raise SystemExit(1)
    dump(argv[0], argv[1], int(argv[2]))


if __name__ == "__main__":
    main()
