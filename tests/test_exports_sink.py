"""S9 per-format partitioned sink + S6 explicit zstd compression:
write melted exports PARTITIONED BY (format), assert on-disk layout,
codec, partition-pruned read-back plan, and content fidelity."""

import os

from pyspark.sql import functions as F

from docling_fast_server_spark.corpus import docs_raw
from docling_fast_server_spark.operators.dispatch import extract_auto
from docling_fast_server_spark.operators.exports import (
    EXPORT_FORMATS,
    melt_exports,
    with_exports,
    write_exports_partitioned,
)


def _extracted(spark, sf_dir):
    return extract_auto(docs_raw(spark, sf_dir, which="all"))


def test_partitioned_sink_layout_and_codec(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exports")
    write_exports_partitioned(_extracted(spark, sf_dir), out)
    # one directory per format (S9 per-format prefixes)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("format="))
    assert dirs == sorted(f"format={f}" for f in EXPORT_FORMATS)
    # zstd set explicitly (S6), visible in the part-file names
    for d in dirs:
        parts = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert parts, f"no parquet files under {d}"
        assert all(".zstd." in f for f in parts), parts


def test_partitioned_read_back_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exports")
    write_exports_partitioned(_extracted(spark, sf_dir), out)
    back = spark.read.parquet(out).filter(F.col("format") == "markdown")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the format predicate must land in PartitionFilters (pruned scan),
    # not in PushedFilters/Filter over data
    assert "PartitionFilters" in plan
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "format" in pf_line
    # only the markdown partition's rows are read
    n_docs = _extracted(spark, sf_dir).count()
    assert back.count() == n_docs


def test_partitioned_content_matches_columns(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exports")
    ext = _extracted(spark, sf_dir)
    write_exports_partitioned(ext, out)
    back = (
        spark.read.parquet(out)
        .filter(F.col("format") == "markdown")
        .select("doc_id", F.col("payload").alias("md_back"))
    )
    direct = with_exports(ext).select("doc_id", "markdown")
    diff = direct.join(back, "doc_id").filter(F.col("markdown") != F.col("md_back"))
    assert diff.count() == 0
    # melt preserves cardinality: 4 rows per doc
    assert melt_exports(ext).count() == 4 * ext.count()


def test_read_export_spans_rehydrates(spark, sf_dir, tmp_path):
    """Export store -> reader -> spans: the json partition re-hydrates
    the extraction EXACTLY; unknown formats are rejected."""
    import pytest

    from docling_fast_server_spark.operators.exports import read_export_spans

    out = str(tmp_path / "exports")
    ext = _extracted(spark, sf_dir)
    write_exports_partitioned(ext, out)
    back = read_export_spans(spark, out, "json")
    a = ext.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    b = back.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert back.filter("conversion_method != 'default'").count() == 0
    # every export format has a reader now (html landed round 5);
    # only a genuinely unknown format raises
    with pytest.raises(ValueError, match="no reader"):
        read_export_spans(spark, out, "protobuf")
