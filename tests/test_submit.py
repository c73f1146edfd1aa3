"""spark-submit --py-files packaging: the job must run from the zip
alone, identically at two parallelism levels with the north rule's literal
4x ratio (N and 4N executors, evidenced in-sandbox via local[2] /
local[8])."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_two_levels():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert os.path.isfile(zip_path)

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    results = {}
    for master in ("local[2]", "local[8]"):
        d = tempfile.mkdtemp(prefix="dfss_submit_")
        try:
            proc = subprocess.run(
                [
                    spark_submit, "--master", master,
                    "--conf", "spark.ui.enabled=false",
                    "--conf", "spark.sql.shuffle.partitions=4",
                    "--py-files", zip_path,
                    os.path.join(ROOT, "scripts", "submit_extract.py"),
                    "--sf-dir", "/root/testdata/sf0.001",
                    "--out", os.path.join(d, "out"),
                    "--lineage", os.path.join(d, "lin"),
                    "--partitions", "4",
                ],
                capture_output=True, text=True, timeout=600,
                cwd=d,  # NOT the repo root: the zip must be self-sufficient
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
            results[master] = json.loads(line)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    assert results["local[2]"]["docs_committed"] == results["local[8]"]["docs_committed"] == 500
