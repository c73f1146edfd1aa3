"""MERGE-grade idempotency: overlapping writers cannot double-append.

The reference returns 409 on duplicate job ids and writes the job store
atomically (ocr.py:96-103, queue_manager.py:917-929). The anti-join
resume closes re-runs that START after a commit; merge_append_table
closes the remaining race where two runs both snapshot the table before
either commits."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from docling_fast_server_spark.corpus import docs_raw
from docling_fast_server_spark.plans.pipeline import run_extraction
from docling_fast_server_spark.sources.io import merge_append_table


def _dup_count(spark, path):
    df = spark.read.parquet(path)
    return df.groupBy("doc_id").count().filter(F.col("count") > 1).count()


def test_merge_append_drops_overlap(spark, tmp_path):
    out = str(tmp_path / "t")
    a = spark.createDataFrame([("d1", 1), ("d2", 2)], "doc_id string, v int")
    b = spark.createDataFrame([("d2", 99), ("d3", 3)], "doc_id string, v int")
    assert merge_append_table(a, out) == 2
    assert merge_append_table(b, out) == 1  # d2 dropped at commit time
    rows = {r["doc_id"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert rows == {"d1": 1, "d2": 2, "d3": 3}  # first writer's d2 wins
    assert merge_append_table(a, out) == 0  # full replay is a no-op


def test_concurrent_runs_no_duplicates(spark, sf_dir, tmp_path):
    """Two overlapping run_extraction calls racing on a fresh table:
    both see it empty (the anti-join protects neither), yet the commit
    protocol admits each doc_id exactly once."""
    out = str(tmp_path / "docs_out")
    lin = str(tmp_path / "lineage")
    raw = docs_raw(spark, sf_dir, which="all").localCheckpoint(eager=True)
    n_docs = raw.count()

    def run(run_id):
        return run_extraction(spark, raw, out, lin, run_id=run_id, partitions=4)

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(run, "race-a")
        f2 = ex.submit(run, "race-b")
        f1.result(timeout=600)
        f2.result(timeout=600)

    committed = spark.read.parquet(out)
    assert committed.count() == n_docs
    assert _dup_count(spark, out) == 0


def test_sequential_rerun_still_noop(spark, sf_dir, tmp_path):
    """The classic resume path still holds with the merge commit."""
    out = str(tmp_path / "docs_out")
    lin = str(tmp_path / "lineage")
    raw = docs_raw(spark, sf_dir, which="html")
    run_extraction(spark, raw, out, lin, run_id="r1")
    n1 = spark.read.parquet(out).count()
    run_extraction(spark, raw, out, lin, run_id="r2")
    assert spark.read.parquet(out).count() == n1
    assert _dup_count(spark, out) == 0


def test_stale_lock_is_stolen(spark, tmp_path):
    """A lock left by a crashed writer must not deadlock the table:
    locks older than LOCK_STALE_S are stolen and the commit proceeds."""
    import os
    import time

    out = str(tmp_path / "t")
    os.makedirs(os.path.join(out, "_commits"), exist_ok=True)
    lock = os.path.join(out, "_commits", ".lock")
    os.mkdir(lock)
    old = time.time() - 3600
    os.utime(lock, (old, old))
    df = spark.createDataFrame([(f"d{i}", i) for i in range(3)], "doc_id string, v int")
    assert merge_append_table(df, out) == 3
    assert spark.read.parquet(out).count() == 3
    assert not os.path.exists(lock)
