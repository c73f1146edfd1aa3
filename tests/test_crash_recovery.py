"""Hard-crash durability: a writer REALLY killed (SIGKILL, no Python
cleanup) mid-commit must leave the table recoverable by the normal
protocol — the next commit GCs its unmanifested files, the orphan sweep
reclaims its staged scratch, and a replay commits exactly once.

The other merge tests simulate crashes by copying files; this one boots
a real writer subprocess and kills it dead at the worst point (data
files renamed into the table, manifest NOT yet published — the window
step 4 of the protocol docstring calls out)."""

import os
import signal
import subprocess
import sys
import textwrap
import time

from pyspark.sql import functions as F

from docling_fast_server_spark.sources.io import _read_manifests, merge_append_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CRASH_WRITER = textwrap.dedent(
    """
    import os, signal, sys
    sys.path.insert(0, {repo!r})
    from docling_fast_server_spark.session import get_spark
    from docling_fast_server_spark.sources import io as io_mod

    # die INSIDE the commit window: after the staged data files are
    # renamed into the table, immediately before the manifest publish
    def _die(*a, **k):
        os.kill(os.getpid(), signal.SIGKILL)

    io_mod._write_manifest = _die
    spark = get_spark("crash-writer", cores=2, shuffle_partitions=2)
    from pyspark.sql import functions as F
    df = spark.range(40).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("crash").alias("v"),
    )
    io_mod.merge_append_table(df, {path!r})
    print("UNREACHABLE")  # the kill must pre-empt this
    """
)


def test_sigkilled_writer_mid_commit_recovers(spark, tmp_path):
    out = str(tmp_path / "t")
    a = spark.createDataFrame([(f"k{i}", i) for i in range(5)], "doc_id string, v int")
    assert merge_append_table(a, out) == 5

    proc = subprocess.run(
        [sys.executable, "-c", _CRASH_WRITER.format(repo=REPO, path=out)],
        capture_output=True,
        text=True,
        timeout=240,
    )
    # SIGKILL'd: negative returncode, and the post-commit line never ran
    assert proc.returncode == -signal.SIGKILL, (proc.returncode, proc.stderr[-500:])
    assert "UNREACHABLE" not in proc.stdout

    # the dead writer left unmanifested merge-* files in the table (its
    # scratch was already consumed by the renames at this kill point)
    # and DIED HOLDING THE COMMIT LOCK with its heartbeat stopped
    committed = {
        f for e in _read_manifests(os.path.join(out, "_commits")) for f in e["files"]
    }
    orphans = [
        f
        for f in os.listdir(out)
        if f.startswith("merge-") and f.endswith(".parquet") and f not in committed
    ]
    assert orphans, "expected the killed writer's unmanifested data files"
    lock = os.path.join(out, "_commits", ".lock")
    assert os.path.isdir(lock), "expected the dead writer's abandoned lock"
    # age the lock past the staleness horizon (the steal machinery is
    # what recovery exercises; waiting LOCK_STALE_S for real is the only
    # difference) — same technique as test_stale_lock_is_stolen
    old_t = time.time() - 3600
    os.utime(lock, (old_t, old_t))

    # manifest-driven readers never saw the phantoms; the next commit
    # GCs them so plain readers converge too, and a full replay of the
    # crashed payload commits EXACTLY once (nothing was half-committed)
    spark.catalog.refreshByPath(out)
    b = spark.createDataFrame([("k5", 5)], "doc_id string, v int")
    assert merge_append_table(b, out) == 1
    replay = spark.range(40).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.lit("crash").alias("v")
    )
    assert merge_append_table(replay, out) == 40
    assert merge_append_table(replay, out) == 0  # idempotent after recovery

    back = spark.read.parquet(out)
    assert back.count() == 5 + 1 + 40
    assert back.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    # the killed writer's data files were GC'd, its stolen lock released
    assert not os.path.exists(lock)
    for f in orphans:
        assert not os.path.exists(os.path.join(out, f))
