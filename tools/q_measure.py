"""Per-query isolation harness for the optimization rounds (guide §1).

Times individual declared queries with the noop sink (same methodology as
bench.py: clearCache before each timed run, noop write so Python stages are
not pruned), best-of-K, and optionally dumps .explain("formatted") to a
plans directory.  Never edits bench.py (frozen for measurement).

Usage:
  python tools/q_measure.py SF_DIR q1 q2 ... [--repeat K] [--plans DIR]
      [--suffix before|after]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from kenlm_rs_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "kenlm-qmeasure", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._corpus_model(spark, args.sf_dir)

    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        times = []
        for i in range(args.repeat):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        out[name] = {
            "min": min(times),
            "samples": times,
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
