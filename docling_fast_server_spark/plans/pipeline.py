"""The end-to-end extraction pipeline: salting, extraction, lineage,
idempotent commit, resume.

The queue lifecycle of the reference (enqueue -> bounded workers ->
job store -> retention; /root/reference/src/services/queue_manager.py:
935-1034) becomes one declarative plan:

    raw docs --anti-join committed--> salt/spread --extract_auto-->
    append output + append lineage

Skew handling (the reference routes big PDFs to bigger worker classes,
docs/DEPLOYMENT_GUIDE.md:126-129,159-165): AQE cannot split one heavy UDF
row, so heavy documents are spread explicitly — repartition on doc_id
hash distributes them uniformly, and sortWithinPartitions by size
descending gives LPT-style scheduling inside each partition so a straggler
1000-page doc starts first instead of last. At 1000 executors the same two
lines are the whole policy; no driver-side loop exists anywhere.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dispatch import extract_auto
from ..operators.lineage import anti_join_committed, lineage_summary, with_partition_metrics
from ..sources.io import append_table, merge_append_table, read_table, table_exists


def spread_by_size(raw: DataFrame, partitions: int | None = None) -> DataFrame:
    """Hash-spread docs across partitions; heaviest first within each
    (needs an n_chars size hint column; falls back to span count)."""
    size_col = "n_chars" if "n_chars" in raw.columns else None
    df = raw if size_col else raw.withColumn("n_chars", F.size("spans"))
    df = (
        df.repartition(partitions, F.col("doc_id"))
        if partitions
        else df.repartition(F.col("doc_id"))
    )
    return df.sortWithinPartitions(F.desc("n_chars"))


def run_extraction(
    spark: SparkSession,
    raw: DataFrame,
    out_path: str,
    lineage_path: str,
    run_id: str | None = None,
    partitions: int | None = None,
    resume: bool = True,
) -> str:
    """Execute (or resume) one extraction run. Returns the run_id.

    Idempotent: docs already present in out_path are skipped via
    anti-join (the content-hash duplicate suppression of
    queue_manager.py:917-929); the append commits atomically."""
    run_id = run_id or uuid.uuid4().hex[:12]
    todo = raw
    if resume and table_exists(spark, out_path):
        todo = anti_join_committed(raw, read_table(spark, out_path))
    extracted = extract_auto(spread_by_size(todo, partitions))
    with_meta = with_partition_metrics(extracted, run_id)
    # Sever plan lineage BEFORE the self-append: the resume anti-join
    # reads out_path, and appending there triggers recacheByPath — any
    # cached plan that references out_path is invalidated and recomputed
    # against the post-append listing, anti-joining everything away
    # (plain persist() does NOT survive this). localCheckpoint cuts the
    # logical plan at the materialized blocks, so both appends read the
    # same snapshot. On the Iceberg production path snapshot isolation
    # makes this a non-issue.
    with_meta = with_meta.localCheckpoint(eager=True)
    # MERGE-grade commit: the anti-join above closes the common resume
    # case, but two runs overlapping in time both snapshot the table
    # before either commits — merge_append_table drops the loser's
    # duplicates at commit time (Iceberg MERGE INTO in production).
    merge_append_table(
        with_meta.select(
            "doc_id", "spans", "conversion_method", "error", "run_id", "partition_id"
        ),
        out_path,
    )
    append_table(
        lineage_summary(with_meta).withColumns(
            {
                "started_at": F.current_timestamp(),
                "ended_at": F.current_timestamp(),
            }
        ),
        lineage_path,
    )
    with_meta.unpersist()
    return run_id
