"""Fused langid+scoring UDF: value-identical to the two-stage chain and a
single ArrowEvalPython stage in the filter plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ctx(spark):
    from kenlm_rs_spark.lm.model import NGramModel
    from kenlm_rs_spark.pipeline.langid import default_langid

    bc_l = spark.sparkContext.broadcast(default_langid())
    bcs = {
        l: spark.sparkContext.broadcast(
            NGramModel.load(os.path.join(REPO, f"fixtures/lms/{l}.arpa"))
        )
        for l in ("en", "de", "fr", "xx")
    }
    return bc_l, bcs


def test_fused_equals_two_stage_chain(spark, ctx):
    from kenlm_rs_spark.pipeline.corpus import generate_pages_df
    from kenlm_rs_spark.pipeline.extract import with_extracted_text
    from kenlm_rs_spark.pipeline.langid import make_langid_udf
    from kenlm_rs_spark.pipeline.scrub import scrub_text
    from kenlm_rs_spark.spark.scoring import (
        make_langid_score_udf,
        make_multi_lm_score_udf,
    )

    bc_l, bcs = ctx
    df = with_extracted_text(generate_pages_df(spark, 300)).withColumn(
        "text_scrubbed", scrub_text(F.col("text"))
    )

    lid = make_langid_udf(bc_l)
    score = make_multi_lm_score_udf(bcs)
    two = (
        df.withColumn("lid", lid(F.col("text")))
        .withColumn("lm", score(F.col("text_scrubbed"), F.col("lid.lang")))
        .select(
            "url",
            F.col("lid.lang").alias("lang"),
            F.col("lid.lang_conf").alias("lang_conf"),
            "lm.log10_prob", "lm.tokens", "lm.oov", "lm.ppl",
        )
    )
    fused_udf = make_langid_score_udf(bc_l, bcs)
    one = df.withColumn(
        "ls", fused_udf(F.col("text"), F.col("text_scrubbed"))
    ).select("url", "ls.*")

    a = {r["url"]: r.asDict() for r in two.collect()}
    b = {r["url"]: r.asDict() for r in one.collect()}
    assert a.keys() == b.keys() and len(a) == 300
    for url in a:
        assert a[url] == b[url], (url, a[url], b[url])
    # dtype parity too (lang_conf must stay float, not widen to double)
    assert dict(two.dtypes) == dict(one.dtypes)


def test_filter_plan_has_single_python_stage(spark, ctx):
    from kenlm_rs_spark.pipeline.corpus import generate_pages_df
    from kenlm_rs_spark.streaming.stream_filter import filter_transform

    bc_l, bcs = ctx
    thr = {l: (40.0, 120.0) for l in ("en", "de", "fr", "xx")}
    plan = (
        filter_transform(generate_pages_df(spark, 20), bc_l, bcs, thr)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # fused langid+scoring plus the independent dup3 UDF all combine into
    # ONE ArrowEvalPython stage (unfused, scoring depended on langid's
    # output and forced a second stage)
    assert plan.count("ArrowEvalPython") == 1, plan[:2000]
