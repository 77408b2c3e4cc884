"""run_filter_job end-to-end: totals, lineage markers, and the kill-and-
rerun resumability target from BASELINE.md §3 ('restart skips completed
partitions; counters consistent'), including the r02 count-verified markers
(a corrupt/premature marker forces recomputation instead of silent skip)."""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LM_DIR = os.path.join(REPO, "fixtures", "lms")
N_DOCS = 400
CHUNKS = 3


@pytest.fixture(scope="module")
def pages(spark):
    from kenlm_rs_spark.pipeline.corpus import generate_pages_df

    return generate_pages_df(spark, N_DOCS).cache()


def _run(spark, pages, out):
    from kenlm_rs_spark.pipeline.filter_job import run_filter_job

    return run_filter_job(spark, pages, out, LM_DIR, n_chunks=CHUNKS)


def test_filter_job_totals_and_lineage(spark, pages, tmp_path):
    out = str(tmp_path / "out")
    t = _run(spark, pages, out)
    assert t["docs"] == N_DOCS
    assert 0 < t["kept"] < N_DOCS
    assert sum(t["by_reason"].values()) == N_DOCS - t["kept"]
    # per-chunk lineage markers with versions
    for k in range(CHUNKS):
        m = json.load(open(os.path.join(out, f"_chunk_{k}.json")))
        assert set(m["versions"]) == {"job", "extractor", "rules"}
        n_written = spark.read.parquet(os.path.join(out, f"chunk={k}")).count()
        assert n_written == m["docs"]
    assert os.path.exists(os.path.join(out, "_thresholds.json"))
    assert os.path.exists(os.path.join(out, "_metrics.json"))


def test_filter_job_resume_skips_and_verifies(spark, pages, tmp_path):
    out = str(tmp_path / "out2")
    t1 = _run(spark, pages, out)

    # clean rerun: all chunks skipped, totals identical, outputs untouched
    mtimes = {
        k: os.path.getmtime(os.path.join(out, f"chunk={k}", "_SUCCESS"))
        for k in range(CHUNKS)
    }
    t2 = _run(spark, pages, out)
    assert (t2["docs"], t2["kept"], t2["by_reason"]) == (
        t1["docs"], t1["kept"], t1["by_reason"]
    )
    for k in range(CHUNKS):
        assert os.path.getmtime(os.path.join(out, f"chunk={k}", "_SUCCESS")) == mtimes[k]

    # simulated crash: marker exists but its count does not match the
    # written parquet -> that chunk must be recomputed, not trusted
    marker = os.path.join(out, "_chunk_1.json")
    m = json.load(open(marker))
    bad = dict(m)
    bad["docs"] = m["docs"] + 5
    bad["kept"] = 0
    json.dump(bad, open(marker, "w"))
    t3 = _run(spark, pages, out)
    assert (t3["docs"], t3["kept"], t3["by_reason"]) == (
        t1["docs"], t1["kept"], t1["by_reason"]
    )
    # the marker was rewritten with the true counts
    m2 = json.load(open(marker))
    assert m2["docs"] == m["docs"] and m2["kept"] == m["kept"]
