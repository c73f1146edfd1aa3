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
