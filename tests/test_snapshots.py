"""Snapshot semantics on the merge-commit manifest: history, time
travel, rollback-then-resume, expiry — the Iceberg snapshot-log analogs
the north rule's resume story rides on."""

from pyspark.sql import functions as F

from docling_fast_server_spark.corpus import docs_raw
from docling_fast_server_spark.plans.pipeline import run_extraction
from docling_fast_server_spark.sources.io import (
    expire_snapshots,
    list_snapshots,
    merge_append_table,
    read_table_asof,
    rollback_table,
)


def _t(spark, ids):
    return spark.createDataFrame([(f"d{i}", i) for i in ids], "doc_id string, v int")


def test_snapshot_log_and_time_travel(spark, tmp_path):
    out = str(tmp_path / "t")
    merge_append_table(_t(spark, range(0, 3)), out)
    merge_append_table(_t(spark, range(3, 5)), out)
    merge_append_table(_t(spark, range(5, 9)), out)
    snaps = list_snapshots(out)
    assert [s["seq"] for s in snaps] == [1, 2, 3]
    assert [s["n_keys"] for s in snaps] == [3, 2, 4]
    assert read_table_asof(spark, out, 1).count() == 3
    assert read_table_asof(spark, out, 2).count() == 5
    assert read_table_asof(spark, out, 3).count() == 9
    assert spark.read.parquet(out).count() == 9


def test_rollback_then_resume(spark, sf_dir, tmp_path):
    """Roll the doc table back one commit; a re-run resumes from the
    snapshot and re-processes exactly the rolled-back documents."""
    out, lin = str(tmp_path / "docs"), str(tmp_path / "lin")
    raw = docs_raw(spark, sf_dir, which="all").localCheckpoint(eager=True)
    half = raw.filter(F.xxhash64("doc_id") % 2 == 0)
    n_half, n_all = half.count(), raw.count()

    run_extraction(spark, half, out, lin, run_id="r1")
    run_extraction(spark, raw, out, lin, run_id="r2")
    assert spark.read.parquet(out).count() == n_all

    removed = rollback_table(spark, out, seq=1)
    assert removed == 1
    assert spark.read.parquet(out).count() == n_half

    run_extraction(spark, raw, out, lin, run_id="r3")
    final = spark.read.parquet(out)
    assert final.count() == n_all
    assert final.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    # the re-run processed only the rolled-back half
    assert final.filter(F.col("run_id") == "r3").count() == n_all - n_half


def test_expire_snapshots_bounds_history(spark, tmp_path):
    out = str(tmp_path / "t")
    for lo, hi in ((0, 3), (3, 5), (5, 9), (9, 10)):
        merge_append_table(_t(spark, range(lo, hi)), out)
    merged = expire_snapshots(out, keep_last=1)
    assert merged == 3
    snaps = list_snapshots(out)
    assert len(snaps) == 2  # merged base + the kept tip
    # live reads and the merge key-set survive expiry
    assert spark.read.parquet(out).count() == 10
    assert read_table_asof(spark, out, snaps[-1]["seq"]).count() == 10
    assert merge_append_table(_t(spark, range(0, 10)), out) == 0  # replay no-op
