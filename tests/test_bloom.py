"""Bloom-pruned resume anti-join: exact equivalence to the plain
anti-join (the operator's defining invariant — Bloom false positives may
only route rows into the exact join, never change the result), routing
diagnostics, and the broadcast-probe plan shape."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from docling_fast_server_spark.operators.bloom import (
    bloom_blocks,
    bloom_params,
    bloom_prune_anti_join,
    bloom_route_counts,
)
from docling_fast_server_spark.operators.lineage import anti_join_committed


def _df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id string")


def _ids(df):
    return sorted(r.doc_id for r in df.toLocalIterator())


def test_params_standard_formulas():
    m, k = bloom_params(10_000, 0.01)
    # -n ln p / ln^2 2 = 95850.6 -> next multiple of 64
    assert m == 95872 and m % 64 == 0
    assert k == 7  # (m/n) ln 2 = 6.64 -> 7
    # cap holds at absurdly low fpp
    _, k2 = bloom_params(100, 1e-9)
    assert k2 == 8


def test_equals_plain_anti_join_with_overlap(spark):
    raw = _df(spark, [f"d{i}" for i in range(500)])
    committed = _df(spark, [f"d{i}" for i in range(0, 500, 3)] + ["zz1", "zz2"])
    got = _ids(bloom_prune_anti_join(raw, committed))
    want = _ids(anti_join_committed(raw, committed))
    assert got == want
    assert len(got) == 500 - len(range(0, 500, 3))


def test_empty_committed_and_full_overlap(spark):
    raw = _df(spark, [f"d{i}" for i in range(50)])
    none = spark.createDataFrame([], "doc_id string")
    assert _ids(bloom_prune_anti_join(raw, none)) == _ids(raw)
    assert _ids(bloom_prune_anti_join(raw, raw)) == []


def test_schema_and_extra_columns_preserved(spark):
    raw = spark.createDataFrame(
        [(f"d{i}", i, f"body {i}") for i in range(40)],
        "doc_id string, n int, text string",
    )
    committed = _df(spark, [f"d{i}" for i in range(0, 40, 2)])
    out = bloom_prune_anti_join(raw, committed)
    assert out.columns == raw.columns
    rows = {r.doc_id: (r.n, r.text) for r in out.toLocalIterator()}
    assert sorted(rows) == sorted(f"d{i}" for i in range(1, 40, 2))
    assert rows["d1"] == (1, "body 1")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw_ids=st.lists(st.integers(0, 300), max_size=120),
    committed_ids=st.lists(st.integers(0, 300), max_size=120),
    fpp=st.sampled_from([0.5, 0.05, 0.01]),
)
def test_property_always_equals_anti_join(spark, raw_ids, committed_ids, fpp):
    raw = _df(spark, [f"k{i}" for i in raw_ids])
    committed = _df(spark, [f"k{i}" for i in committed_ids])
    got = _ids(bloom_prune_anti_join(raw, committed, fpp=fpp))
    want = _ids(anti_join_committed(raw, committed))
    assert got == want


def test_blocks_are_a_compact_bitset(spark):
    committed = _df(spark, [f"d{i}" for i in range(200)])
    m, k = bloom_params(200, 0.01)
    blocks = bloom_blocks(committed, "doc_id", m, k).collect()
    assert all(0 <= r.block < m // 64 for r in blocks)
    assert len(blocks) <= min(m // 64, 200 * k)
    total_bits = sum(bin(r.word & ((1 << 64) - 1)).count("1") for r in blocks)
    assert 0 < total_bits <= 200 * k


def test_route_counts_surface_filter_health(spark):
    raw = _df(spark, [f"d{i}" for i in range(1000)])
    committed = _df(spark, [f"d{i}" for i in range(100)])
    row = bloom_route_counts(raw, committed, fpp=0.01).collect()[0]
    assert row.n_definite_new + row.n_maybe_committed == 1000
    # every committed id must probe as maybe (no false negatives)...
    assert row.n_maybe_committed >= 100
    # ...and fpp keeps the routed slice close to |committed|
    assert row.n_maybe_committed <= 100 + 0.05 * 1000
    empty = spark.createDataFrame([], "doc_id string")
    row0 = bloom_route_counts(raw, empty).collect()[0]
    assert (row0.n_definite_new, row0.n_maybe_committed) == (1000, 0)


def test_plan_probes_are_broadcast_joins(spark):
    raw = _df(spark, [f"d{i}" for i in range(300)])
    committed = _df(spark, [f"d{i}" for i in range(60)])
    out = bloom_prune_anti_join(raw, committed, fpp=0.01)
    _, k = bloom_params(60, 0.01)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every probe is a map-side broadcast hash lookup of the block table —
    # the raw corpus is never hash-partitioned on the probe path
    assert plan.count("BroadcastHashJoin") >= k


def test_run_extraction_bloom_resume_idempotent(spark, sf_dir, tmp_path):
    """The "bloom" resume strategy through the REAL pipeline: resume a
    half-committed run, then re-run — same committed table as the plain
    anti-join path (which test_pipeline.py certifies), no duplicates."""
    import os

    from docling_fast_server_spark.corpus import docs_raw
    from docling_fast_server_spark.plans.pipeline import run_extraction
    from docling_fast_server_spark.sources.io import read_table

    out = os.path.join(str(tmp_path), "docs_spans")
    lin = os.path.join(str(tmp_path), "lineage")
    raw = docs_raw(spark, sf_dir, which="all")
    total = raw.count()

    half = raw.filter(F.col("doc_id") < "doc-000250")
    run_extraction(spark, half, out, lin, run_id="b1", partitions=4)
    n1 = read_table(spark, out).count()
    assert 0 < n1 < total

    run_extraction(
        spark, raw, out, lin, run_id="b2", partitions=4, resume_strategy="bloom"
    )
    committed = read_table(spark, out)
    assert committed.count() == total
    assert committed.select("doc_id").distinct().count() == total

    # idempotent bloom re-run: everything probes committed, nothing appends
    run_extraction(
        spark, raw, out, lin, run_id="b3", partitions=4, resume_strategy="bloom"
    )
    assert read_table(spark, out).count() == total
