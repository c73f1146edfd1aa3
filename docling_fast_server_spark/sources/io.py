"""Table IO — Iceberg-first design, parquet fallback in this sandbox.

Production design (the north rule): input and output are Iceberg tables;
resume rides on Iceberg snapshot isolation, idempotency on MERGE INTO by
doc_id (the 409-on-duplicate analog, /root/reference/src/routes/ocr.py:
99-103), retention on row-level DELETE + snapshot expiry (the 24h TTL of
redis_job_store.py:70 and queue_manager.py:804-819), compaction on
rewrite_data_files (the gzip archive rotation of queue_manager.py:443-469).

This sandbox ships no Iceberg runtime jar, so the same semantics degrade
to directory-per-table parquet with Spark's atomic job-commit protocol:

- append-only writes commit atomically per job (staged _temporary +
  rename) — a crashed run leaves no partial data visible;
- idempotency comes from the anti-join resume (lineage.anti_join_committed)
  performed BEFORE the write, so re-runs add only missing doc_ids;
- `overwrite` mode is the snapshot-replace analog.

When an Iceberg jar is present (session.get_spark detects it), the same
calls route through writeTo(...) on the `local` catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    return "org.apache.iceberg.spark.SparkCatalog" == spark.conf.get(
        "spark.sql.catalog.local", ""
    )


def table_exists(spark: SparkSession, path: str) -> bool:
    if _has_iceberg(spark) and not path.startswith("/"):
        return spark.catalog.tableExists(path)
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if _has_iceberg(spark) and not path.startswith("/"):
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def append_table(df: DataFrame, path: str) -> None:
    """Atomic append (job-commit). Caller is responsible for having
    anti-joined committed keys first (idempotent-append discipline)."""
    spark = df.sparkSession
    if _has_iceberg(spark) and not path.startswith("/"):
        df.writeTo(path).append()
    else:
        df.write.mode("append").parquet(path)


def overwrite_table(df: DataFrame, path: str) -> None:
    spark = df.sparkSession
    if _has_iceberg(spark) and not path.startswith("/"):
        df.writeTo(path).createOrReplace()
    else:
        df.write.mode("overwrite").parquet(path)


def retention_delete(spark: SparkSession, path: str, predicate: str) -> int:
    """Row-level retention delete: drop rows matching `predicate` (SQL
    string), keep the rest — the 24h TTL / JOB_RETENTION_HOURS cleanup of
    the reference (redis_job_store.py:70 TTL; queue_manager.py:804-819;
    job_db.py:241-260 `DELETE FROM jobs WHERE created_at < ?`).

    Iceberg: `DELETE FROM t WHERE ...` (position deletes + snapshot).
    Parquet fallback: rewrite keep-side to a staging dir, atomic swap.
    Returns number of rows deleted."""
    import shutil
    import tempfile

    df = read_table(spark, path)
    if _has_iceberg(spark) and not path.startswith("/"):
        n = df.filter(predicate).count()
        spark.sql(f"DELETE FROM {path} WHERE {predicate}")
        return n
    total = df.count()
    keep = df.filter(f"NOT ({predicate})")
    staging = tempfile.mkdtemp(prefix="dfss_retention_")
    keep.write.mode("overwrite").parquet(staging)
    kept = spark.read.parquet(staging).count()
    shutil.rmtree(path)
    shutil.move(staging, path)
    spark.catalog.refreshByPath(path)
    return total - kept


def compact_table(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-file compaction — the gzip archive rotation / rewrite analog
    (queue_manager.py:443-469 rotates jobs_*.json.gz; Iceberg:
    rewrite_data_files). Rewrites the table into `target_files` files.
    Returns the new file count."""
    import os as _os
    import shutil
    import tempfile

    df = read_table(spark, path)
    staging = tempfile.mkdtemp(prefix="dfss_compact_")
    df.coalesce(target_files).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    shutil.move(staging, path)
    spark.catalog.refreshByPath(path)
    return sum(1 for f in _os.listdir(path) if f.endswith(".parquet"))


def table_stats(path: str) -> dict:
    """Storage stats — file count + total bytes (the get_storage_stats
    analog, queue_manager.py:740-790; Iceberg exposes this via the
    `.files` metadata table)."""
    import os as _os

    files = [f for f in _os.listdir(path) if f.endswith(".parquet")]
    total = sum(_os.path.getsize(_os.path.join(path, f)) for f in files)
    return {"n_files": len(files), "total_bytes": total}
