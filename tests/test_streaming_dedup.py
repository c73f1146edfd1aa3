"""Streaming exact dedup (dedup-on-ingest) vs its batch twin.

Replays the mutated near-dup corpus as an ORDERED multi-file stream
(originals + near copies first, exact copies second, one file per
trigger) and checks the verdict table against the batch
min-per-text-group rule computed independently in DuckDB.
"""

import os
import shutil
import tempfile
import time

import duckdb
import pytest

from docling_fast_server_spark.operators import dedup
from docling_fast_server_spark.streaming.dedup import streaming_dedup_exact


@pytest.fixture()
def ddirs():
    d = tempfile.mkdtemp(prefix="dfss_sdedup_")
    yield {k: os.path.join(d, k) for k in ("in", "ckpt")}
    shutil.rmtree(d, ignore_errors=True)


def _drain(stream_df, ckpt, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_dedup_matches_batch_twin(spark, sf_dir, ddirs):
    """Every arriving doc gets exactly one verdict; keepers equal the
    batch min-per-text-group mapping (arrival order = id order here, so
    first-seen == min); duplicates are exactly the docs whose text was
    seen before."""
    corpus = dedup.mutated_corpus(spark, sf_dir)
    first = corpus.filter(corpus.doc_id < dedup.EXACT_STEP)
    second = corpus.filter(corpus.doc_id >= dedup.EXACT_STEP)  # exact copies
    os.makedirs(ddirs["in"], exist_ok=True)
    first.coalesce(1).write.mode("overwrite").parquet(ddirs["in"] + "/batch=0")
    second.coalesce(1).write.mode("overwrite").parquet(ddirs["in"] + "/batch=1")
    # one flat dir, ordered by mtime: copy files so batch 0 is older
    flat = ddirs["in"] + "/flat"
    os.makedirs(flat)
    for b in (0, 1):
        src = ddirs["in"] + f"/batch={b}"
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"{b}_{f}")
                shutil.copy(os.path.join(src, f), dst)
                os.utime(dst, (time.time() - 100 + b, time.time() - 100 + b))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(flat)
    )
    _drain(streaming_dedup_exact(stream), ddirs["ckpt"], "sdedup")
    got = {
        int(r["doc_id"]): (int(r["keeper_doc_id"]), bool(r["is_duplicate"]))
        for r in spark.sql("SELECT * FROM sdedup").collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.execute(
        f"""
        WITH corpus AS ({dedup.MUTATED_SQL})
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keeper
        FROM corpus
        """
    ).fetchall()
    con.close()
    expect = {int(d): (int(k), int(d) != int(k)) for d, k in rows}

    assert len(got) == len(expect)  # exactly one verdict per arriving doc
    assert got == expect
    dups = [d for d, (_, is_dup) in got.items() if is_dup]
    assert len(dups) > 0  # the injected exact copies were flagged
    assert all(d >= dedup.EXACT_STEP or got[d][0] < d for d in dups)


def test_streaming_dedup_state_expires_and_readmits(spark, ddirs):
    """The retention analog (JOB_RETENTION_HOURS): after the hash
    entry's processing-time timeout fires, the SAME content arriving
    again is first-seen — the duplicate is re-admitted, exactly like a
    job re-submitted after its record expired."""
    os.makedirs(ddirs["in"], exist_ok=True)
    flat = ddirs["in"] + "/flat"
    os.makedirs(flat)

    def write_batch(tag, rows, age_s):
        pdf = spark.createDataFrame(rows, "doc_id long, text string")
        d = ddirs["in"] + f"/b{tag}"
        pdf.coalesce(1).write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"{tag}_{f}")
                shutil.copy(os.path.join(d, f), dst)
                os.utime(dst, (time.time() - age_s, time.time() - age_s))

    out = ddirs["in"] + "/verdicts"

    def drain_parquet():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(flat)
        )
        q = (
            streaming_dedup_exact(stream, retention_s=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ddirs["ckpt"])
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch(0, [(1, "same text"), (2, "same text")], 100)
    drain_parquet()
    time.sleep(2)  # let the 1 s retention pass wall-clock
    write_batch(1, [(3, "same text")], 50)
    # second drain resumes from the checkpoint; the hash entry's
    # retention has passed, so doc 3 must be FIRST-SEEN again
    drain_parquet()
    got = {
        int(r["doc_id"]): (int(r["keeper_doc_id"]), bool(r["is_duplicate"]))
        for r in spark.read.parquet(out).collect()
    }
    assert got[1] == (1, False)
    assert got[2] == (1, True)
    assert got[3] == (3, False), got  # re-admitted after retention expiry
