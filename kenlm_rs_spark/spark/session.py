"""SparkSession factory with the physical-execution defaults this engine needs.

Settings chosen for the 100 TB design point (and safe on local[N]):
- Arrow-vectorized Python UDF transfer (the scorer is a pandas UDF; JVM->Python
  crossing happens once per RecordBatch, the Spark analogue of the reference's
  single FFI crossing per batch).
- AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
  partition counts when stats are off by 100x.
- Explicit Arrow batch size: Python-stage memory is bounded by
  maxRecordsPerBatch x row width, independent of input split size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "kenlm_rs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # executors must be able to unpickle kenlm_rs_spark UDF closures no
    # matter the caller's cwd (the local analogue of spark-submit
    # --py-files): ship the package's parent dir on the workers' PYTHONPATH
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    worker_pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in worker_pp.split(os.pathsep):
        worker_pp = pkg_parent + (os.pathsep + worker_pp if worker_pp else "")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.executorEnv.PYTHONPATH", worker_pp)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
