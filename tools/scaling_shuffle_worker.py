"""Single shuffle-heavy scaling worker: fuzzy-dedup wall time at a given
parallelism. Invoked by tools/scaling_shuffle_run.py as a fresh process per
core count (fresh JVM, no warm-cache bleed).

The job is the full production fuzzy-dedup shape (MinHash-LSH blocking ->
exact Jaccard verify -> connected components -> keep-one-per-cluster),
whose hot path is SHUFFLE-BOUND (shingle explode + band self-join + pair
aggregation + iterative label propagation) — the complement of the
Arrow-stage-bound filter job in scaling_filter_worker.py, which has no
shuffle in its hot path by design.

Usage: python tools/scaling_shuffle_worker.py <pages_parquet> <cpus>
Prints one JSON line {"cpus": N, "docs": D, "sec": S, "docs_per_sec": R}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pages_path, cpus = sys.argv[1], int(sys.argv[2])

    from pyspark.sql import functions as F

    from kenlm_rs_spark.ops.components import dedup_clusters
    from kenlm_rs_spark.ops.dedup import lsh_jaccard_dedup
    from kenlm_rs_spark.spark.session import get_spark

    spark = get_spark(
        f"scaling-shuffle-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
        # keep the job SHUFFLE-bound (the point of this proxy): at 120k
        # docs AQE otherwise promotes the multi-million-row verify-join
        # side to a broadcast that the small proxy JVM cannot build
        # (notEnoughMemoryToBuildAndBroadcastTableError at local[2])
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024)
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(pages_path).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    n_docs = docs.count()

    def job():
        pairs = lsh_jaccard_dedup(
            docs, shingle_n=3, num_hashes=8, bands=4, threshold=0.12
        )
        out = dedup_clusters(pairs).select("doc_id", "cluster_id", "is_survivor")
        out.write.format("noop").mode("overwrite").save()
        for d in getattr(pairs, "cached_deps", []):
            d.unpersist()

    # warm-up on a slice (JIT, codegen, shuffle machinery)
    warm_pairs = lsh_jaccard_dedup(
        docs.limit(5000), shingle_n=3, num_hashes=8, bands=4, threshold=0.12
    )
    dedup_clusters(warm_pairs).write.format("noop").mode("overwrite").save()
    for d in getattr(warm_pairs, "cached_deps", []):
        d.unpersist()
    spark.catalog.clearCache()

    secs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        job()
        secs.append(round(time.time() - t0, 2))
    sec = min(secs)
    print(json.dumps({
        "cpus": cpus,
        "docs": n_docs,
        "sec": sec,
        "secs": secs,
        "docs_per_sec": round(n_docs / sec, 1),
        "loadavg": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
