"""Single scaling-run worker: steady-state filter throughput at a given
parallelism. Invoked by tools/scaling_run.py as a fresh process per core
count (fresh JVM, no warm-cache bleed).

Usage: python tools/scaling_filter_worker.py <pages_parquet> <cpus>
Prints one JSON line {"cpus": N, "docs": D, "sec": S, "docs_per_sec": R}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    pages_path, cpus = sys.argv[1], int(sys.argv[2])

    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.pipeline.langid import default_langid
    from kenlm_rs_spark.spark.session import get_spark
    from kenlm_rs_spark.streaming.stream_filter import filter_transform

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    bc_langid = spark.sparkContext.broadcast(default_langid())
    bc_models = {
        lang: spark.sparkContext.broadcast(
            NGramModel.load(os.path.join(REPO, f"fixtures/lms/{lang}.arpa"))
        )
        for lang in ("en", "de", "fr", "xx")
    }
    thresholds = {lang: (40.0, 120.0) for lang in ("en", "de", "fr", "xx")}

    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()

    # warm-up pass on a slice (JIT, python workers, broadcast fetch)
    filter_transform(pages.limit(2000), bc_langid, bc_models, thresholds).write.mode(
        "overwrite"
    ).format("noop").save()

    # best-of-3 timed passes: the host is shared (external load observed up
    # to loadavg 15 with no local processes), so min wall-clock is the
    # least-contended estimate of the job's true cost
    secs = []
    for _ in range(3):
        t0 = time.time()
        filter_transform(pages, bc_langid, bc_models, thresholds).write.mode(
            "overwrite"
        ).format("noop").save()
        secs.append(time.time() - t0)
    sec = min(secs)
    print(json.dumps({
        "cpus": cpus, "docs": n_docs, "sec": round(sec, 2),
        "all_secs": [round(x, 2) for x in secs],
        "docs_per_sec": round(n_docs / sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
