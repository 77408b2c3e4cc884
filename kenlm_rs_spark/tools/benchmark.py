"""kenlm_benchmark twin (lm/kenlm_benchmark_main.cc): steady-state scoring
throughput of a loaded model, with the reference's two phases —

  vocab: stdin text -> stdout fixed-width little-endian word-id stream, one
         EndSentence id appended per line (ConvertToBytes);
  query: id stream -> total log10 probability + throughput; the scoring
         chain starts from the BeginSentence state and resets to it after
         each EOS id, exactly like the reference's Worker loop.

Usage:
  python -m kenlm_rs_spark.tools.benchmark vocab model.bin < text > ids
  python -m kenlm_rs_spark.tools.benchmark query model.bin < ids
"""

from __future__ import annotations

import struct
import sys
import time

import numpy as np


def _width_for(bound: int) -> int:
    for bits in (8, 16, 32):
        if bound < (1 << bits):
            return bits
    return 64


def convert_to_bytes(model, lines, out, width_bits: int | None = None) -> int:
    bits = width_bits or _width_for(len(model.get_vocab() or []) + 1)
    dtype = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[bits]
    eos = model.get_word_idx("</s>")
    n = 0
    for line in lines:
        ids = [model.get_word_idx(w) for w in line.split()] + [eos]
        out.write(np.asarray(ids, dtype=dtype).tobytes())
        n += len(ids)
    return n


def query_bytes(model, data: bytes, width_bits: int) -> tuple[float, int]:
    dtype = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[width_bits]
    ids = np.frombuffer(data, dtype=dtype).astype(np.int64)
    eos = model.get_word_idx("</s>")
    begin = model.bos_state()
    state = begin
    total = np.float32(0.0)
    for wid in ids:
        prob, state = model.full_score(state, int(wid))[:2]
        total += np.float32(prob)
        if wid == eos:
            state = begin
    return float(total), len(ids)


def main(argv=None, stdin=None, stdout=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[0] not in ("vocab", "query"):
        print("Usage: benchmark {vocab|query} model [width_bits]", file=sys.stderr)
        raise SystemExit(1)

    from ..lm.model import NGramModel

    model = NGramModel.load(argv[1])
    bits = int(argv[2]) if len(argv) > 2 else None
    if argv[0] == "vocab":
        src = stdin or sys.stdin
        out = stdout or sys.stdout.buffer
        n = convert_to_bytes(model, src, out, bits)
        print(f"converted {n} ids", file=sys.stderr)
        return
    data = (stdin or sys.stdin.buffer).read()
    bits = bits or _width_for(len(model.get_vocab() or []) + 1)
    t0 = time.time()
    total, n = query_bytes(model, data, bits)
    dt = time.time() - t0
    out = stdout or sys.stdout
    out.write(f"Total: {total}\n")
    print(
        f"queries: {n}  seconds: {dt:.4f}  queries/sec: {n / max(dt, 1e-9):.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
