"""Streaming ingestion parity: the streamed extraction must equal the
batch extraction on the same input, and the checkpoint must make a second
drain a no-op (exactly-once file tracking)."""

import os
import shutil
import tempfile

import pytest

from docling_fast_server_spark.corpus import docs_raw
from docling_fast_server_spark.streaming.ingest import stream_extract


@pytest.fixture()
def sdirs():
    d = tempfile.mkdtemp(prefix="dfss_stream_")
    yield {k: os.path.join(d, k) for k in ("in", "out", "ckpt")}
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, sf_dir, sdirs):
    raw = docs_raw(spark, sf_dir, which="all").limit(60)
    raw.write.mode("overwrite").parquet(sdirs["in"])
    n_in = spark.read.parquet(sdirs["in"]).count()

    q = stream_extract(spark, sdirs["in"], sdirs["out"], sdirs["ckpt"])
    q.awaitTermination(120)
    out = spark.read.parquet(sdirs["out"])
    assert out.count() == n_in
    assert set(out.columns) >= {"doc_id", "spans", "conversion_method"}

    # drain again: checkpoint remembers processed files -> no duplicates
    q2 = stream_extract(spark, sdirs["in"], sdirs["out"], sdirs["ckpt"])
    q2.awaitTermination(120)
    assert spark.read.parquet(sdirs["out"]).count() == n_in
