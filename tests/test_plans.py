"""Physical-plan audits — the 100 TB design claims, checked on the
actual optimized plans (SURVEY §4 discipline):

- extraction is shuffle-free (no Exchange in the plan),
- exports/chunking add no Python evaluation (JVM-side only),
- scans push filters and prune columns,
- small dims broadcast.
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    """explain('formatted') output — lists every node with its Input
    columns, so tests can assert WHAT each Exchange actually carries."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchange_inputs(formatted: str) -> list[str]:
    """The Input/Arguments lines of every Exchange-family node."""
    blocks = formatted.split("\n\n")
    out = []
    for b in blocks:
        lines = b.strip().splitlines()
        if lines and "Exchange" in lines[0] and lines[0].lstrip().startswith("("):
            out.append(b)
    return out


def test_extraction_plan_is_shuffle_free(spark, sf_dir):
    from docling_fast_server_spark.corpus import docs_raw
    from docling_fast_server_spark.operators.dispatch import extract_auto

    plan = _plan(extract_auto(docs_raw(spark, sf_dir)))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" not in plan  # r8: datagen is flat-column Arrow too
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan, plan  # the
    # flat-column kernels (no per-span dicts cross the boundary)


def test_fused_extraction_single_python_node(spark, sf_dir):
    """The flagship extract_all runs ONE fused Python kernel (r8): no
    intermediate raw-span Arrow round trip, no Exchange."""
    from docling_fast_server_spark.queries import extract_all

    plan = _plan(extract_all(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert plan.count("MapInArrow") + plan.count("PythonMapInArrow") >= 1
    assert plan.count("_gen_extract") <= 1 and "MapInPandas" not in plan


def test_exports_stay_jvm_side(spark, sf_dir):
    """The export fan-out must not add any Python/Arrow eval beyond the
    two pipeline kernels (datagen + extraction)."""
    from docling_fast_server_spark.operators.exports import with_exports
    from docling_fast_server_spark.queries import extract_all

    base = _plan(extract_all(spark, sf_dir))
    full = _plan(with_exports(extract_all(spark, sf_dir)))
    assert full.count("MapInPandas") == base.count("MapInPandas")
    assert "BatchEvalPython" not in full
    assert "Exchange" not in full


def test_chunking_is_shuffle_free(spark, sf_dir):
    """The chunker computes heading propagation, piece explosion, the
    running token count and chunk grouping WITHIN each document's span
    array (higher-order functions), so extract -> chunk is one narrow
    stage: no Exchange, no Window, no Python eval. (Rounds 1-2 exploded
    to rows and hash-partitioned the full span payload by doc_id.)"""
    from docling_fast_server_spark.operators.chunking import chunk_spans
    from docling_fast_server_spark.queries import extract_all

    for kw in ({}, {"budget": 10, "tokenizer": "bpe"}):
        # route='hof' is what the fused pipeline queries use (kernel-fed
        # input is span-ceiling-guaranteed, see q_chunks)
        plan = _plan(chunk_spans(extract_all(spark, sf_dir), route="hof", **kw))
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan, plan
        assert "Window" not in plan, plan


def test_scan_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1996-01-01")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double" in plan


def test_region_revenue_broadcasts_dims(spark, sf_dir):
    from docling_fast_server_spark.operators.relational import q_region_revenue

    plan = _plan(q_region_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum


def test_fingerprint_plan_is_narrow(spark, sf_dir):
    """ts_fingerprint must be ONE narrow projection: no Exchange, no
    Window (round 1 funneled every distinct word through an unpartitioned
    dense_rank window), no Python eval."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["ts_fingerprint"](spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_minhash_plan_has_no_dictionary(spark, sf_dir):
    """dedup_minhash signatures are narrow higher-order projections: no
    broadcast of a distinct-shingle relation (the round-1 rank
    dictionary stays gone), no Python eval. The ONLY Window allowed is
    the r6 per-bucket skew cap, recognizable by its (band, key)
    partition spec — any other Window would mean a dictionary or
    per-doc ranking crept back in."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["dedup_minhash"](spark, sf_dir))
    for line in plan.splitlines():
        if "Window" in line:
            # also allowed: the clique-rep min window over the set-fold
            # pair (f1, f2) — the other r6 skew guard
            assert ("band" in line and "key" in line) or (
                "f1" in line and "f2" in line
            ), line
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan  # verify-stage counts


def test_dedup_family_never_shuffles_text(spark, sf_dir):
    """The dedup module's core claim, checked on the physical plans: NO
    Exchange (hash, range, or broadcast) in ANY dedup query carries the
    raw `text` column. Wide ops move only int64 hashes, ids and counts —
    the shape that survives 100 TB (round 2 repartitioned the corpus
    before projecting to hash sets, shipping every document's text
    through the shuffle fabric)."""
    import re

    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "dedup_exact",
        "dedup_minhash",
        "dedup_simhash",  # the folded row runs signatures AND pairs
        "dedup_ngram_jaccard",
    ):
        fmt = _formatted(qs[name](spark, sf_dir))
        for block in _exchange_inputs(fmt):
            assert not re.search(r"\btext#", block), f"{name}: text rides an Exchange:\n{block}"


def test_vectors_never_ride_a_hash_exchange(spark, sf_dir):
    """Embedding operators must not ship vectors through shuffle fabric:
    LSH band keys are a narrow literal-plane projection (round 2
    crossJoined a plane table and re-grouped, shuffling bands*n vectors)
    and IVF cell ranking is a narrow broadcast-codebook array_sort
    (round 2 windowed by vec_id, two table-wide vector exchanges). Only
    broadcast of the tiny query/codebook side may carry vectors; in
    dedup_embedding the (band, key) candidate join is the one allowed
    vector-carrying partitioning."""
    import re

    import __spark_entry__ as e

    qs = e.queries()
    allowed_keys = {"dedup_embedding": ("band", "key")}
    for name in ("sim_topk_brute", "sim_ann_lsh", "sim_ann_ivf", "dedup_embedding"):
        fmt = _formatted(qs[name](spark, sf_dir))
        for block in _exchange_inputs(fmt):
            lines = block.strip().splitlines()
            if "BroadcastExchange" in lines[0]:
                continue  # tiny side by construction
            inp = next((l for l in lines if l.startswith("Input")), "")
            if re.search(r"\b(v|qv|cv)#", inp):
                arg = next((l for l in lines if l.startswith("Arguments")), "")
                keys = allowed_keys.get(name)
                assert keys and all(f"{k}#" in arg for k in keys), (
                    f"{name}: vectors ride a non-candidate-join Exchange:\n{block}"
                )


def test_binary_extraction_plan_is_shuffle_free(spark, sf_dir):
    """The bytes path (pack -> parse -> extract) stays a single narrow
    pipeline like the structured path."""
    from docling_fast_server_spark.corpus import docs_raw
    from docling_fast_server_spark.sources.binary_pack import extract_binary, pack_raw

    plan = _plan(extract_binary(pack_raw(docs_raw(spark, sf_dir))))
    assert "Exchange" not in plan, plan
    # pack + parse+extract are MapInPandas; datagen is Arrow since r8
    assert plan.count("MapInPandas") == 2
    assert plan.count("MapInArrow") + plan.count("PythonMapInArrow") == 1


def test_similarity_topk_pushdown_and_broadcasts(spark, sf_dir):
    """All three similarity strategies must keep the rank<=k pushdown
    (WindowGroupLimit) and broadcast their small side; none may add
    Python evaluation."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in ("sim_topk_brute", "sim_ann_lsh", "sim_ann_ivf"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "WindowGroupLimit" in plan, name
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, name
        assert "BatchEvalPython" not in plan, name
