"""N vs 4N EXECUTORS, as literally as this sandbox allows: K independent
Spark JVMs ("executors") of FIXED width local[8], barrier-synchronized so
all timed passes overlap fully, each scanning a disjoint 1/K slice of the
same input. Efficiency = (aggregate_rate_K / K) / rate_1.

This complements tools/scaling_run.py (which varies threads within ONE JVM)
and isolates node-level scale-out from the intra-JVM thread ceiling that
BENCH/BASELINE.md documents.

Usage: python tools/multi_jvm_scaling.py [K ...]   (default 1 4)
Env: MJS_DOCS (default 120000), MJS_WIDTH (default 8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("MJS_DOCS", "120000"))
WIDTH = int(os.environ.get("MJS_WIDTH", "8"))
PAGES = f"/tmp/scaling_pages_{N_DOCS}.parquet"

WORKER = r'''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from kenlm_rs_spark.spark.session import get_spark
from kenlm_rs_spark.lm.model import NGramModel
from kenlm_rs_spark.pipeline.langid import default_langid
from kenlm_rs_spark.streaming.stream_filter import filter_transform

pages_path, width, k, i, sync_dir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
spark = get_spark(f"mjs-{i}", master=f"local[{width}]", shuffle_partitions=width * 2)
spark.sparkContext.setLogLevel("ERROR")
bc_langid = spark.sparkContext.broadcast(default_langid())
bc_models = {l: spark.sparkContext.broadcast(NGramModel.load(f"/root/repo/fixtures/lms/{l}.arpa"))
             for l in ("en", "de", "fr", "xx")}
thresholds = {l: (40.0, 120.0) for l in ("en", "de", "fr", "xx")}
# disjoint 1/K slice per executor (url-hash partitioned, like a real cluster)
pages = spark.read.parquet(pages_path).filter(F.pmod(F.xxhash64("url"), F.lit(k)) == i)
n = pages.count()
def one_pass():
    filter_transform(pages, bc_langid, bc_models, thresholds) \
        .write.mode("overwrite").format("noop").save()
one_pass()  # warm: python workers, broadcasts, JIT
secs = []
for r in range(3):  # 3 barrier-synchronized rounds; orchestrator takes best
    open(os.path.join(sync_dir, f"ready_{r}_{i}"), "w").close()
    while not os.path.exists(os.path.join(sync_dir, f"go_{r}")):
        time.sleep(0.05)
    t0 = time.time()
    one_pass()
    secs.append(round(time.time() - t0, 3))
print(json.dumps({"i": i, "docs": n, "secs": secs}), flush=True)
spark.stop()
'''


def run_k(k: int) -> dict:
    import tempfile

    sync_dir = tempfile.mkdtemp(prefix=f"mjs_{k}_")
    wpath = os.path.join(sync_dir, "worker.py")
    open(wpath, "w").write(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, wpath, PAGES, str(WIDTH), str(k), str(i), sync_dir],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(k)
    ]
    for r in range(3):
        deadline = time.time() + 420
        while time.time() < deadline:
            if all(
                os.path.exists(os.path.join(sync_dir, f"ready_{r}_{i}"))
                for i in range(k)
            ):
                break
            time.sleep(0.2)
        else:
            for p in procs:
                p.kill()
            raise SystemExit(f"k={k}: workers not ready for round {r}")
        open(os.path.join(sync_dir, f"go_{r}"), "w").close()
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        results.append(json.loads(out.strip().splitlines()[-1]))
    total_docs = sum(r["docs"] for r in results)
    # per synchronized round, wall = slowest worker; report the best round
    walls = [max(r["secs"][j] for r in results) for j in range(3)]
    wall = min(walls)
    return {
        "k": k, "width": WIDTH, "docs": total_docs,
        "round_walls": [round(w, 2) for w in walls],
        "wall_sec": wall,
        "agg_docs_per_sec": round(total_docs / wall, 1),
    }


def main():
    ks = [int(x) for x in sys.argv[1:]] or [1, 4]
    if not os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        import tools.scaling_run as sr

        sr.N_DOCS, sr.PAGES = N_DOCS, PAGES
        sr.ensure_pages()
    out = {}
    for k in ks:
        la = os.getloadavg()[0]
        r = run_k(k)
        r["loadavg_before"] = round(la, 1)
        out[k] = r
        print(json.dumps(r))
    if 1 in out and len(ks) > 1:
        base = out[1]["agg_docs_per_sec"]
        for k in ks:
            if k == 1:
                continue
            eff = out[k]["agg_docs_per_sec"] / base / k
            print(json.dumps({"executors": f"1->{k}", "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
