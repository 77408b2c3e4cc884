"""Freeze the expected-output fixture set (FIXTURES.md §4).

Runs the filter pipeline at the current pinned version over the deterministic
sf_tiny synthetic corpus (1000 pages, seed 42) and freezes per-url reference
labels: scrubbed-text sha256 (byte-identity gate), keep/drop decision,
perplexity columns. Later runs must reproduce keep/drop at F1 >= 0.99 and
hashes byte-identically.

Usage: python tools/freeze_expected.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "expected")
N_DOCS = 1000


def build_expected(spark):
    from pyspark.sql import functions as F

    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.pipeline.corpus import generate_pages_df
    from kenlm_rs_spark.pipeline.langid import default_langid
    from kenlm_rs_spark.pipeline.quality import ppl_thresholds
    from kenlm_rs_spark.streaming.stream_filter import filter_transform

    bc_langid = spark.sparkContext.broadcast(default_langid())
    bc_models = {
        lang: spark.sparkContext.broadcast(
            NGramModel.load(os.path.join(REPO, f"fixtures/lms/{lang}.arpa"))
        )
        for lang in ("en", "de", "fr", "xx")
    }
    pages = generate_pages_df(spark, N_DOCS, partitions=8)

    thr_path = os.path.join(OUT, "thresholds.json")
    if os.path.exists(thr_path):
        thresholds = {k: tuple(v) for k, v in json.load(open(thr_path)).items()}
    else:
        # one bootstrap pass with provisional buckets to compute tertiles
        provisional = {l: (1.0, 1e9) for l in ("en", "de", "fr", "xx", "und")}
        scored = filter_transform(pages, bc_langid, bc_models, provisional)
        thresholds = ppl_thresholds(scored, lang_col="lang_pred", ppl_col="ppl")
        os.makedirs(OUT, exist_ok=True)
        json.dump(thresholds, open(thr_path, "w"), indent=1, sort_keys=True)

    res = filter_transform(pages, bc_langid, bc_models, thresholds)
    return res.select(
        "url",
        F.sha2(F.col("text"), 256).alias("extracted_sha256"),
        F.sha2(F.col("text_scrubbed"), 256).alias("scrubbed_sha256"),
        "lang_pred",
        F.round("log10_prob", 4).alias("log10_prob"),
        "tokens",
        "oov",
        F.round("ppl", 4).alias("ppl"),
        "bucket",
        "keep",
        "drop_reason",
    )


def main():
    from kenlm_rs_spark.spark.session import get_spark

    spark = get_spark("freeze-expected", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = build_expected(spark)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(OUT, "expected.parquet"))
    n = spark.read.parquet(os.path.join(OUT, "expected.parquet")).count()
    kept = (
        spark.read.parquet(os.path.join(OUT, "expected.parquet"))
        .filter("keep").count()
    )
    print(json.dumps({"rows": n, "kept": kept}))
    spark.stop()


if __name__ == "__main__":
    main()
