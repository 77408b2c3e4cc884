"""North-rule launch shape: the filter job must run via
`spark-submit --py-files kenlm_rs_spark.zip` with the package supplied ONLY
by the zip (fresh cwd, stripped PYTHONPATH) — the literal multi-executor
cluster submit path, exercised end-to-end in local mode."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_filter_job(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "kenlm_rs_spark.zip"))
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_filter_job.py"),
            "--generate", "200",
            "--output", out_dir,
            "--lm-dir", os.path.join(REPO, "fixtures", "lms"),
            "--chunks", "2",
        ],
        cwd=str(tmp_path),  # no kenlm_rs_spark importable from cwd
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    totals = json.loads(proc.stdout.strip().splitlines()[-1])
    assert totals["docs"] == 200
    assert 0 < totals["kept"] < 200
    # lineage markers + thresholds written by the submitted job
    assert os.path.exists(os.path.join(out_dir, "_metrics.json"))
    assert os.path.exists(os.path.join(out_dir, "_thresholds.json"))
    for k in range(2):
        assert os.path.exists(os.path.join(out_dir, f"_chunk_{k}.json"))
