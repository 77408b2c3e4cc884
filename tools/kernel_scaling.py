"""CPU-attribution probe for the ~12k docs/sec local[32] ceiling: run the
ACTUAL scoring kernel (score_texts over the en fixture model) in K
independent processes with no Spark at all, and report aggregate docs/sec
per K. If the kernel itself stops scaling, the ceiling is memory-bandwidth /
SMT contention in the NumPy gathers; if it scales ~linearly while the Spark
job does not, the ceiling is Spark-side (or external tenants).

Usage: python tools/kernel_scaling.py [K ...]   (default 1 8 32)
Prints one JSON line per K plus a summary line. Each worker scores the same
deterministic 2000-doc batch in a loop for ~3 seconds.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL = os.path.join(REPO, "fixtures", "lms", "en.arpa")
SECONDS = float(os.environ.get("KERNEL_SECONDS", "3"))


def _make_texts(n=2000):
    import numpy as np

    rng = np.random.default_rng(42)
    from kenlm_rs_spark.lm.arpa import read_arpa

    words = [r.ngram[0] for r in read_arpa(MODEL).backoffs[0]][:500]
    return [
        " ".join(rng.choice(words, size=rng.integers(30, 120)).tolist())
        for _ in range(n)
    ]


def worker(q, barrier):
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.lm.score import score_texts

    model = NGramModel.load(MODEL)
    texts = _make_texts()
    # warm
    score_texts(model, texts[:100])
    barrier.wait()
    t0 = time.time()
    done = 0
    while time.time() - t0 < SECONDS:
        score_texts(model, texts)
        done += len(texts)
    q.put((done, time.time() - t0))


def run(k: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(k)
    procs = [mp.Process(target=worker, args=(q, barrier)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = []
    for _ in procs:
        done, dt = q.get()
        rates.append(done / dt)
    for p in procs:
        p.join()
    return sum(rates)


def main():
    ks = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    out = {}
    for k in ks:
        la = os.getloadavg()[0]
        rate = run(k)
        out[k] = round(rate, 1)
        print(json.dumps({"k": k, "docs_per_sec": out[k], "loadavg_before": la}))
    base = out[ks[0]] / ks[0]
    print(json.dumps({
        "summary": {str(k): {"docs_per_sec": out[k],
                             "speedup_vs_1core": round(out[k] / base, 2)}
                    for k in ks}
    }))


if __name__ == "__main__":
    main()
