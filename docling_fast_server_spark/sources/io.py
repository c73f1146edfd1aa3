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


def _stage_and_rename_in(df: DataFrame, path: str) -> str:
    """Write df to a private hidden staging dir under `path`, then rename
    the part files (commit-unique names) into the table. Hadoop's
    FileOutputCommitter shares `_temporary/0` across concurrent jobs
    appending to the same path — two plain `mode("append")` writers
    corrupt each other's commit — so every append gets its own staging
    and joins the table via atomic renames. Returns the staging dir it
    consumed (already removed)."""
    import shutil
    import tempfile

    os.makedirs(path, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=".dfss-stage-", dir=path)
    df.write.mode("overwrite").parquet(staging)
    for f in os.listdir(staging):
        if f.endswith(".parquet"):
            os.rename(os.path.join(staging, f), os.path.join(path, f))
    shutil.rmtree(staging)
    return staging


def append_table(df: DataFrame, path: str) -> None:
    """Atomic, concurrent-safe append (private staging + rename-in; see
    _stage_and_rename_in). Caller is responsible for having anti-joined
    committed keys first (idempotent-append discipline)."""
    spark = df.sparkSession
    if _has_iceberg(spark) and not path.startswith("/"):
        df.writeTo(path).append()
    else:
        _stage_and_rename_in(df, path)
        spark.catalog.refreshByPath(path)


from contextlib import contextmanager


LOCK_STALE_S = 300  # a holder that hasn't finished in 5 min is dead


@contextmanager
def _commit_lock(commits_dir: str):
    """Table commit lock: atomic POSIX mkdir (the catalog analog).

    Stale-lock recovery: a writer that crashed INSIDE the critical
    section leaves the lock dir behind; without recovery every later
    writer spins forever. A lock older than LOCK_STALE_S is stolen
    (rmdir + retry — the rmdir itself races safely: at most one stealer
    wins the subsequent mkdir). Safe because the protected section is
    seconds long and a crashed holder's staged files are invisible until
    its manifest rename, which by construction never happened."""
    import time

    lock = os.path.join(commits_dir, ".lock")
    while True:
        try:
            os.mkdir(lock)
            break
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock) > LOCK_STALE_S:
                    os.rmdir(lock)
                    continue
            except OSError:
                pass  # lock released or stolen between the checks
            time.sleep(0.05)
    try:
        yield
    finally:
        try:
            os.rmdir(lock)
        except OSError:  # pragma: no cover — stolen after a stall
            pass


def _read_manifests(commits_dir: str) -> list[dict]:
    """All commit manifests, ordered by sequence number."""
    import json

    entries = []
    if os.path.isdir(commits_dir):
        for f in os.listdir(commits_dir):
            if f.startswith("commit-") and f.endswith(".json"):
                with open(os.path.join(commits_dir, f), encoding="utf-8") as fh:
                    e = json.load(fh)
                e["_manifest_file"] = f
                entries.append(e)
    return sorted(entries, key=lambda e: e["seq"])


def _write_manifest(commits_dir: str, entry: dict) -> None:
    """Publish a manifest entry via atomic rename (written LAST, so
    unmanifested data files always belong to an uncommitted writer)."""
    import json

    tmp = os.path.join(commits_dir, f".commit-{entry['commit_id']}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(entry, fh)
    os.rename(tmp, os.path.join(commits_dir, f"commit-{entry['seq']:08d}-{entry['commit_id']}.json"))


def list_snapshots(path: str) -> list[dict]:
    """Commit history of a merge-committed table — the Iceberg snapshot
    log analog (`SELECT * FROM t.snapshots`). One row per commit:
    (seq, commit_id, n_files, n_keys)."""
    return [
        {
            "seq": e["seq"],
            "commit_id": e["commit_id"],
            "n_files": len(e["files"]),
            "n_keys": len(e["keys"]),
        }
        for e in _read_manifests(os.path.join(path, "_commits"))
    ]


def read_table_asof(spark: SparkSession, path: str, seq: int) -> DataFrame:
    """Time travel: the table as of commit `seq` — the Iceberg
    `VERSION AS OF` analog. Reads exactly the data files published by
    commits <= seq (files from later commits, uncommitted writers, or
    non-merge appends are excluded)."""
    files = [
        os.path.join(path, f)
        for e in _read_manifests(os.path.join(path, "_commits"))
        if e["seq"] <= seq
        for f in e["files"]
    ]
    if not files:
        raise ValueError(f"no committed snapshot at or before seq={seq}")
    return spark.read.parquet(*files)


def rollback_table(spark: SparkSession, path: str, seq: int) -> int:
    """Roll the table back to commit `seq`: delete the data files AND
    manifests of every later commit (under the commit lock), so both the
    live table and the merge key-set reflect the snapshot — a subsequent
    `run_extraction` resume re-processes exactly the rolled-back
    documents. The Iceberg `rollback_to_snapshot` analog. Returns the
    number of commits removed."""
    commits_dir = os.path.join(path, "_commits")
    with _commit_lock(commits_dir):
        doomed = [e for e in _read_manifests(commits_dir) if e["seq"] > seq]
        for e in doomed:
            for f in e["files"]:
                fp = os.path.join(path, f)
                if os.path.exists(fp):
                    os.remove(fp)
            os.remove(os.path.join(commits_dir, e["_manifest_file"]))
    spark.catalog.refreshByPath(path)
    return len(doomed)


def expire_snapshots(path: str, keep_last: int = 1) -> int:
    """Compact commit history: merge all but the last `keep_last`
    manifests into one base manifest (data files untouched, history
    before the merge point no longer addressable) — the Iceberg
    `expire_snapshots` analog that bounds metadata growth. Returns the
    number of manifests merged away."""
    import uuid as _uuid

    commits_dir = os.path.join(path, "_commits")
    with _commit_lock(commits_dir):
        entries = _read_manifests(commits_dir)
        if len(entries) <= max(keep_last, 1):
            return 0
        old = entries[: len(entries) - keep_last] if keep_last > 0 else entries
        base = {
            "seq": old[-1]["seq"],
            "commit_id": _uuid.uuid4().hex[:12],
            "files": sorted(f for e in old for f in e["files"]),
            "keys": sorted({k for e in old for k in e["keys"]}),
        }
        for e in old:
            os.remove(os.path.join(commits_dir, e["_manifest_file"]))
        _write_manifest(commits_dir, base)
        return len(old)


def merge_append_table(df: DataFrame, path: str, key: str = "doc_id") -> int:
    """MERGE-grade idempotent append: rows whose `key` is already
    committed are dropped AT COMMIT TIME, so two OVERLAPPING writers can
    both stage the same document and only one copy becomes visible — the
    reference's duplicate-job 409 (ocr.py:96-103) and atomic job-store
    write (queue_manager.py:917-929) as a table protocol. The plain
    anti-join resume (lineage.anti_join_committed) closes the common
    case but leaves a read-check-then-append race between its snapshot
    and the commit; this closes the race.

    Iceberg path: a real `MERGE INTO ... WHEN NOT MATCHED THEN INSERT`
    (snapshot-isolated, conflict-retried by the catalog).

    Parquet fallback — optimistic commit with a manifest, the same
    protocol Iceberg runs in its metadata layer:
      1. stage data files OUTSIDE the lock (parallel write to a
         dot-prefixed dir Spark readers ignore);
      2. take the table commit lock (atomic POSIX mkdir, the catalog
         analog);
      3. under the lock, diff staged keys against the committed manifest
         (_commits/*.txt, one key per line); rewrite the staged files
         without the overlap if any;
      4. rename the staged part files into the table, then publish the
         manifest entry via atomic rename;
      5. release the lock.
    A crash before (4) leaves only ignored hidden files; a crash during
    (4) is repaired by the manifest being written last (unmanifested
    part files belong to the crashed commit and its keys re-merge
    cleanly on retry because data-file names are commit-unique).

    The manifest key-set scan is driver-side here — the sandbox stand-in
    for Iceberg's distributed metadata; at 10^12 keys the Iceberg branch
    is the design and this branch is the semantics contract + test rig.
    Returns the number of rows actually committed."""
    import shutil
    import tempfile
    import uuid as _uuid

    spark = df.sparkSession
    if _has_iceberg(spark) and not path.startswith("/"):
        view = f"merge_src_{_uuid.uuid4().hex[:8]}"
        df.createOrReplaceTempView(view)
        n = spark.table(view).count()
        spark.sql(
            f"MERGE INTO {path} t USING {view} s ON t.{key} = s.{key} "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return n

    os.makedirs(path, exist_ok=True)
    commits_dir = os.path.join(path, "_commits")
    os.makedirs(commits_dir, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=".dfss-stage-", dir=path)
    df.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)

    with _commit_lock(commits_dir):
        entries = _read_manifests(commits_dir)
        committed: set[str] = set()
        for e in entries:
            committed.update(e["keys"])
        staged_ids = {str(r[0]) for r in staged.select(key).distinct().collect()}
        new_ids = staged_ids - committed
        if not new_ids:
            shutil.rmtree(staging)
            return 0
        src_dir = staging
        if staged_ids - new_ids:  # overlap: rewrite without committed keys
            filtered = tempfile.mkdtemp(prefix=".dfss-stage-", dir=path)
            ids_df = spark.createDataFrame([(i,) for i in committed], f"{key} string")
            staged.join(ids_df, key, "left_anti").write.mode("overwrite").parquet(filtered)
            shutil.rmtree(staging)
            src_dir = filtered
        n_rows = spark.read.parquet(src_dir).count()
        data_files = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
        for f in data_files:
            os.rename(os.path.join(src_dir, f), os.path.join(path, f))
        shutil.rmtree(src_dir)
        seq = max((e["seq"] for e in entries), default=0) + 1
        _write_manifest(
            commits_dir,
            {
                "seq": seq,
                "commit_id": _uuid.uuid4().hex[:12],
                "files": sorted(data_files),
                "keys": sorted(new_ids),
            },
        )
        spark.catalog.refreshByPath(path)
        return n_rows


def overwrite_table(df: DataFrame, path: str) -> None:
    spark = df.sparkSession
    if _has_iceberg(spark) and not path.startswith("/"):
        df.writeTo(path).createOrReplace()
    else:
        df.write.mode("overwrite").parquet(path)


def _swap_table(spark: SparkSession, path: str, write_staging) -> None:
    """Replace the table at `path` with whatever `write_staging(dir)`
    produces, crash-safely: staging is created UNDER THE TABLE'S PARENT
    (same filesystem, so the swap is two true renames, never a
    non-atomic cross-device copy), the old table is renamed aside before
    the new one is renamed in, and the old copy is deleted LAST — a crash
    at any point leaves either the old or the new table intact and a
    recoverable `.dfss-old-*` copy on disk. (Round 1 did
    rmtree(path); move(staging, path) — a crash between the two destroyed
    the table.)"""
    import shutil
    import tempfile

    abs_path = os.path.abspath(path.rstrip("/"))
    parent = os.path.dirname(abs_path)
    staging = tempfile.mkdtemp(prefix=".dfss-staging-", dir=parent)
    write_staging(staging)
    old = tempfile.mkdtemp(prefix=".dfss-old-", dir=parent)
    os.rmdir(old)  # reserve a unique same-filesystem name for the rename
    os.rename(abs_path, old)
    os.rename(staging, abs_path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(abs_path)


def retention_delete(spark: SparkSession, path: str, predicate: str) -> int:
    """Row-level retention delete: drop rows matching `predicate` (SQL
    string), keep the rest — the 24h TTL / JOB_RETENTION_HOURS cleanup of
    the reference (redis_job_store.py:70 TTL; queue_manager.py:804-819;
    job_db.py:241-260 `DELETE FROM jobs WHERE created_at < ?`).

    Iceberg: `DELETE FROM t WHERE ...` (position deletes + snapshot).
    Parquet fallback: rewrite keep-side to a staging dir, rename swap.
    Returns number of rows deleted."""
    df = read_table(spark, path)
    if _has_iceberg(spark) and not path.startswith("/"):
        n = df.filter(predicate).count()
        spark.sql(f"DELETE FROM {path} WHERE {predicate}")
        return n
    total = df.count()
    keep = df.filter(f"NOT ({predicate})")
    kept_box = {}

    def _write(staging: str) -> None:
        keep.write.mode("overwrite").parquet(staging)
        kept_box["n"] = spark.read.parquet(staging).count()

    _swap_table(spark, path, _write)
    return total - kept_box["n"]


def compact_table(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-file compaction — the gzip archive rotation / rewrite analog
    (queue_manager.py:443-469 rotates jobs_*.json.gz; Iceberg:
    rewrite_data_files). Rewrites the table into `target_files` files.
    Returns the new file count."""
    import os as _os

    df = read_table(spark, path)
    _swap_table(
        spark,
        path,
        lambda staging: df.coalesce(target_files).write.mode("overwrite").parquet(staging),
    )
    return sum(1 for f in _os.listdir(path) if f.endswith(".parquet"))


def table_stats(path: str) -> dict:
    """Storage stats — file count + total bytes (the get_storage_stats
    analog, queue_manager.py:740-790; Iceberg exposes this via the
    `.files` metadata table)."""
    import os as _os

    files = [f for f in _os.listdir(path) if f.endswith(".parquet")]
    total = sum(_os.path.getsize(_os.path.join(path, f)) for f in files)
    return {"n_files": len(files), "total_bytes": total}
