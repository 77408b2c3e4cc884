"""Shuffle-heavy two-cluster-size scaling evidence (VERDICT r6 item 6).

The 2v8 filter-job proxy (tools/scaling_run.py) deliberately has no shuffle
in its hot path, so it proves the Arrow path scales, not the dedup path.
This runner times the SHUFFLE-BOUND fuzzy-dedup job (MinHash-LSH -> verify
join -> connected components) at two parallelism levels, interleaved
best-of-2 in fresh JVMs, and appends the result to
BENCH/scaling_last_run.md.

Defaults to local[2] vs local[8] (CLAUDE.md: 8v32 comparisons get starved
by external tenant load on this shared host). Note the documented caveat:
shuffle-bound jobs read LOWER on a shared-memory proxy — all "network"
traffic contends for one memory subsystem and the reduce fan-in is real —
so the target here is >= 0.6, not the 0.8 of the narrow-stage job.

Usage: SCALING_CONFIGS=2,8 python tools/scaling_shuffle_run.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SCALING_DOCS", "120000"))
CONFIGS = tuple(
    int(x) for x in os.environ.get("SCALING_CONFIGS", "2,8").split(",")
)
PAGES = os.environ.get("SCALING_PAGES", f"/tmp/scaling_pages_{N_DOCS}.parquet")


def ensure_pages():
    if os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        return
    from kenlm_rs_spark.pipeline.corpus import generate_pages_df
    from kenlm_rs_spark.spark.session import get_spark

    spark = get_spark("gen-pages", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages_df(spark, N_DOCS, partitions=64).select(
        "url", "warc_ts", "html", "text", "lang"
    ).write.mode("overwrite").parquet(PAGES)
    spark.stop()


def run_worker(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "scaling_shuffle_worker.py"),
         PAGES, str(cpus)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {cpus} failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    sys.path.insert(0, REPO)
    ensure_pages()
    best: dict[int, dict] = {}
    for cpus in CONFIGS + CONFIGS:  # interleaved best-of-2 per config
        r = run_worker(cpus)
        if cpus not in best or r["docs_per_sec"] > best[cpus]["docs_per_sec"]:
            best[cpus] = r
    lo, hi = best[CONFIGS[0]], best[CONFIGS[1]]
    factor = CONFIGS[1] / CONFIGS[0]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / factor

    section = f"""

## Shuffle-heavy complement (r7): fuzzy-dedup 2-cluster-size proxy

The filter-job proxy above has NO shuffle in its hot path; this section
times the SHUFFLE-BOUND fuzzy-dedup job (MinHash-LSH blocking -> exact
Jaccard verify join -> iterative connected components) on a
{lo['docs']}-doc table from the same deterministic pages generator at `local[{CONFIGS[0]}]` vs `local[{CONFIGS[1]}]`, fresh JVMs,
interleaved best-of-2. Shuffle-bound jobs read LOWER on a shared-memory
proxy (one memory subsystem serves all "network" traffic); target >= 0.6.

| parallelism | docs | wall sec | docs/sec | loadavg |
|---|---|---|---|---|
| local[{CONFIGS[0]}] (N) | {lo['docs']} | {lo['sec']} | {lo['docs_per_sec']} | {lo['loadavg']} |
| local[{CONFIGS[1]}] ({factor:.0f}N) | {hi['docs']} | {hi['sec']} | {hi['docs_per_sec']} | {hi['loadavg']} |

**Speedup {CONFIGS[0]} -> {CONFIGS[1]}: {hi['docs_per_sec'] / lo['docs_per_sec']:.2f}x; scaling efficiency: {eff:.2f}**

Raw: `{json.dumps(lo)}` / `{json.dumps(hi)}`
"""
    path = os.path.join(REPO, "BENCH", "scaling_last_run.md")
    with open(path, "a") as f:
        f.write(section)
    print(json.dumps({
        "docs": lo["docs"],
        "configs": list(CONFIGS),
        "docs_per_sec_n": lo["docs_per_sec"],
        "docs_per_sec_kn": hi["docs_per_sec"],
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
