"""End-to-end pipeline: lineage, resume anti-join, idempotent append."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docling_fast_server_spark.corpus import docs_raw
from docling_fast_server_spark.plans.pipeline import run_extraction
from docling_fast_server_spark.sources.io import read_table


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="dfss_pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_run_resume_idempotent(spark, sf_dir, workdir):
    out = os.path.join(workdir, "docs_spans")
    lin = os.path.join(workdir, "lineage")
    raw = docs_raw(spark, sf_dir, which="all")
    total = raw.count()

    # first run: only half the corpus (a crashed run analog)
    half = raw.filter(F.col("doc_id") < "doc-000250")
    run_extraction(spark, half, out, lin, run_id="run1", partitions=4)
    n1 = read_table(spark, out).count()
    assert 0 < n1 < total

    # resume: full input, anti-join skips the committed half
    run_extraction(spark, raw, out, lin, run_id="run2", partitions=4)
    committed = read_table(spark, out)
    assert committed.count() == total
    assert committed.select("doc_id").distinct().count() == total

    # idempotent re-run: nothing to do, no duplicates
    run_extraction(spark, raw, out, lin, run_id="run3", partitions=4)
    again = read_table(spark, out)
    assert again.count() == total

    # lineage accounting adds up
    lineage = read_table(spark, lin)
    agg = lineage.agg(
        F.sum("doc_count").alias("docs"), F.sum("error_count").alias("errs")
    ).collect()[0]
    assert agg["docs"] == total
    assert agg["errs"] == 0
    run2 = lineage.filter(F.col("run_id") == "run2")
    assert run2.count() > 0  # per-partition rows exist
    assert lineage.filter(F.col("run_id") == "run3").count() == 0 or (
        lineage.filter(F.col("run_id") == "run3").agg(F.sum("doc_count")).collect()[0][0] == 0
    )


def test_spread_by_size_distributes(spark, sf_dir):
    from docling_fast_server_spark.plans.pipeline import spread_by_size

    raw = docs_raw(spark, sf_dir, which="all", skew=True)
    spread = spread_by_size(raw, partitions=8)
    sizes = (
        spread.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("n_chars").alias("bytes"))
        .collect()
    )
    per = sorted(r["bytes"] for r in sizes)
    assert len(per) == 8
    # no partition should carry more than ~3x the median load
    assert per[-1] <= 3 * per[len(per) // 2]
