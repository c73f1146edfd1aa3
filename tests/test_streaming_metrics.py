"""Streaming metrics + stateful sessionization: watermarked windowed
aggregation and applyInPandasWithState session windows, each checked
against its batch twin on the same input."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docling_fast_server_spark.streaming.metrics import (
    SESSION_GAP_S,
    stateful_sessionize,
    windowed_method_counts,
)


@pytest.fixture()
def sdirs():
    d = tempfile.mkdtemp(prefix="dfss_smetrics_")
    yield {k: os.path.join(d, k) for k in ("in", "ckpt", "ckpt2")}
    shutil.rmtree(d, ignore_errors=True)


def _drain(stream_df, ckpt):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(os.path.basename(ckpt))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_method_counts_matches_batch(spark, sf_dir, sdirs):
    """Stream the extracted table with synthetic event times; the
    watermarked windowed histogram must equal the batch groupBy on the
    same data (no lateness beyond the watermark in this fixture)."""
    from docling_fast_server_spark.queries import extract_all

    ext = extract_all(spark, sf_dir).limit(80).select("doc_id", "conversion_method")
    # deterministic event time: spread docs over 3 tumbling windows
    with_ts = ext.withColumn(
        "event_time",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + (F.xxhash64("doc_id") % 3) * F.expr("INTERVAL 10 MINUTES"),
    )
    # append mode only emits a window once the WATERMARK passes its end:
    # a far-future sentinel event advances the watermark so the real
    # windows flush in the final no-data micro-batch (its own window
    # stays open and is correctly withheld)
    sentinel = spark.createDataFrame(
        [("sentinel", "sentinel")], "doc_id string, conversion_method string"
    ).withColumn(
        "event_time",
        F.to_timestamp(F.lit("2026-01-01 02:00:00")),
    )
    with_ts.unionByName(sentinel).write.mode("overwrite").parquet(sdirs["in"])

    stream = spark.readStream.schema(
        "doc_id string, conversion_method string, event_time timestamp"
    ).parquet(sdirs["in"])
    _drain(windowed_method_counts(stream), sdirs["ckpt"])
    got = {
        (r["window_start"], r["conversion_method"]): r["n_docs"]
        for r in spark.sql(f"SELECT * FROM {os.path.basename(sdirs['ckpt'])}").collect()
    }
    want = {
        (r["ws"], r["conversion_method"]): r["n"]
        for r in spark.read.parquet(sdirs["in"])
        .filter(F.col("conversion_method") != "sentinel")
        .groupBy(
            F.window("event_time", "10 minutes").start.alias("ws"), "conversion_method"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stateful_sessionize_matches_batch(spark, sdirs):
    """applyInPandasWithState sessions == the batch gap-window sessions
    on a replayed event log (sessions the stream hasn't closed yet are
    exempt — close them with a far-future flush event per user)."""
    rows = []
    base = 1_760_000_000  # epoch seconds
    for u in (1, 2):
        t = base + u * 17
        for s in range(2):  # two sessions per user
            for k in range(3):  # three events per session
                rows.append((u, t))
                t += 60  # in-gap
            t += SESSION_GAP_S + 120  # gap -> closes the session
        rows.append((u, t + 10 * SESSION_GAP_S))  # flush event (stays open)
    ev = spark.createDataFrame(rows, "user_id long, ts long").select(
        "user_id", F.col("ts").cast("timestamp").alias("event_time")
    )
    ev.write.mode("overwrite").parquet(sdirs["in"])

    stream = spark.readStream.schema("user_id long, event_time timestamp").parquet(
        sdirs["in"]
    )
    _drain(stateful_sessionize(stream), sdirs["ckpt2"])
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {os.path.basename(sdirs['ckpt2'])}").collect()
    }
    assert len(got) == 4  # 2 users x 2 closed sessions
    for user_id, start, end, n in got:
        assert n == 3
        assert (end - start).total_seconds() == 120
