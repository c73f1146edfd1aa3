"""Property-based tests (hypothesis) — invariants the golden fixtures
can't cover: arbitrary inputs, permutation invariance, monotonic offsets.

The reference has no property tests (SURVEY §5 'notably absent'); these
harden the from-scratch kernels beyond the deterministic corpus.
"""

import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_fast_server_spark.corpus import (
    expected_spans,
    logical_items,
    render_html,
    render_pdf_cells,
)
from docling_fast_server_spark.model import doc_id_str
from docling_fast_server_spark.operators.html_extract import extract_html_document
from docling_fast_server_spark.operators.pdf_layout import extract_pdf_document

# alphabet includes the serializer escape specials (round 4: `"\<&>`), so
# the render-escape -> kernel-unescape round-trip is property-tested, not
# just fixture-tested. Deliberately EXCLUDED: space (word separator), '|'
# (table cell separator), and ':'/'='/'+' — those can make a plain text
# paragraph match the kv/formula LABELING HEURISTICS (e.g. "a: b" labels
# key_value_area), which is correct heuristic behavior but not what the
# corpus-spec oracle predicts for arbitrary word soup.
_words = st.lists(
    st.text(
        alphabet='abcdefghijklmnopqrstuvwxyz0123456789"\\<&>', min_size=1, max_size=8
    ),
    min_size=1,
    max_size=300,
)


@settings(max_examples=60, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=10_000), words=_words)
def test_roundtrip_any_text(doc_id, words):
    """For ANY word soup: render -> extract == expected, both raw paths."""
    text = " ".join(words)
    want = [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_spans(doc_id, text)
    ]
    if doc_id % 2 == 0:
        got = extract_html_document(doc_id_str(doc_id), render_html(doc_id, text))
    else:
        got, _ = extract_pdf_document(render_pdf_cells(doc_id, text))
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got] == want


@settings(max_examples=40, deadline=None)
@given(
    doc_id=st.integers(min_value=1, max_value=9_999).filter(lambda d: d % 2 == 1),
    words=_words,
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_pdf_reading_order_permutation_invariant(doc_id, words, seed):
    """Reading order must be recovered from geometry regardless of the
    storage permutation of the cells (K3 invariant)."""
    text = " ".join(words)
    cells = render_pdf_cells(doc_id, text)
    rng = random.Random(seed)
    shuffled = cells[:]
    rng.shuffle(shuffled)
    a, _ = extract_pdf_document(cells)
    b, _ = extract_pdf_document(shuffled)
    assert a == b


@settings(max_examples=40, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=10_000), words=_words)
def test_offsets_contiguous_and_kinds_valid(doc_id, words):
    from docling_fast_server_spark.model import EXTRACTED_KINDS

    spans = expected_spans(doc_id, " ".join(words))
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert all(s["kind"] in EXTRACTED_KINDS for s in spans)
    # every span is either text-bearing or a media reference
    assert all(s["text"] is not None or s["media_ref"] is not None for s in spans)


@settings(max_examples=30, deadline=None)
@given(
    doc_id=st.integers(min_value=1, max_value=9_999).filter(lambda d: d % 2 == 1),
    words=_words,
)
def test_pdf_corrupt_cell_degrades_not_dies(doc_id, words):
    """ANY single corrupted cell -> limited tier or clean subset, never an
    exception (K10: degrade, never die)."""
    cells = render_pdf_cells(doc_id, " ".join(words))
    for i in range(min(len(cells), 3)):
        broken = [dict(c) for c in cells]
        broken[i]["text"] = "NOT JSON" + (broken[i]["text"] or "")
        try:
            spans, method = extract_pdf_document(broken)
            assert method in ("default", "limited")
        except ValueError:
            # acceptable only if the corrupted cell is a TEXT cell (the
            # limited tier only drops media); the task-level wrapper maps
            # this to a failed row, never a crash
            assert broken[i]["kind"] == "pdf_cell"


def test_chunker_partition_property(spark, sf_dir):
    """Chunks partition the spans: token counts and span counts add up,
    and no chunk exceeds budget unless a single span does."""
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators.chunking import DEFAULT_BUDGET, chunk_spans
    from docling_fast_server_spark.queries import extract_all

    extracted = extract_all(spark, sf_dir).limit(100).cache()
    chunks = chunk_spans(extracted)
    tot = chunks.groupBy("doc_id").agg(
        F.sum("n_spans").alias("spans"), F.sum("n_tokens").alias("toks")
    )
    direct = extracted.select(
        "doc_id",
        F.size("spans").alias("spans_d"),
        F.aggregate(
            F.transform(
                "spans",
                lambda s: F.when(s["text"].isNull(), F.lit(0)).otherwise(
                    F.size(F.split(s["text"], " "))
                ),
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("toks_d"),
    )
    j = tot.join(direct, "doc_id")
    bad = j.filter(
        (F.col("spans") != F.col("spans_d")) | (F.col("toks") != F.col("toks_d"))
    ).count()
    assert bad == 0
    # budget property: chunk starts before the budget line; a chunk longer
    # than budget+max_single_span_tokens would indicate a grouping bug
    over = chunks.filter(F.col("n_tokens") > DEFAULT_BUDGET + 60).count()
    assert over == 0
    extracted.unpersist()


def test_sample_slot_no_overflow_at_corpus_scale(spark):
    """sample_slot must agree with exact big-int arithmetic AND with
    DuckDB for doc_ids past the int64 overflow point of the naive
    doc_id * MIX form (~3.5e9). Probes up to 2^62."""
    import duckdb
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators.relational import (
        SAMPLE_MIX,
        SAMPLE_P,
        SAMPLE_PCT_MOD,
        sample_slot,
    )

    ids = [0, 1, 3_499_999_999, 2**33, 2**33 + 7, 2**40 + 123, 2**62 - 1]
    want = [(i * SAMPLE_MIX) % SAMPLE_P % SAMPLE_PCT_MOD for i in ids]  # bigint truth
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = [
        r["slot"]
        for r in df.select(sample_slot(F.col("doc_id")).alias("slot"))
        .orderBy("doc_id")  # createDataFrame order is not guaranteed
        .collect()
    ]
    ids_sorted = sorted(ids)
    want_sorted = [(i * SAMPLE_MIX) % SAMPLE_P % SAMPLE_PCT_MOD for i in ids_sorted]
    assert got == want_sorted, (got, want_sorted)
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT ((CAST({i} AS BIGINT) % {SAMPLE_P}) * {SAMPLE_MIX % SAMPLE_P} "
            f"% {SAMPLE_P}) % {SAMPLE_PCT_MOD}"
        ).fetchone()[0]
        for i in ids
    ]
    con.close()
    assert duck == want, (duck, want)


def test_ann_recall_on_clustered_corpus(spark):
    """Real embedding corpora cluster; the uniform-vector recall numbers
    (LSH 0.67 / IVF 0.53, test below) are the worst case. On a
    deterministic 20-center mixture (center scale ±200, per-coordinate
    noise ±80) BOTH scale strategies must recover >=0.9 of the exact
    top-3 (observed 1.0): every true neighbor is a cluster-mate, shares
    its LSH band keys and IVF cells, and is therefore a candidate.
    Reported per round in BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators.similarity import (
        ANN_TOPK,
        DIM,
        brute_topk,
        ivf_topk,
        lsh_topk,
    )

    MIX, NOISE, CENTERS = 2654435761, 80, 20
    vecs = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                (((F.lit(1) + ((F.col("id") % CENTERS) * DIM + d) * MIX) % 41) - 20).cast("double")
                * 10.0
                + ((((F.col("id") * DIM + d) * 40503) % (2 * NOISE + 1)) - NOISE).cast("double")
            ),
        ).alias("v"),
    ).localCheckpoint(eager=True)
    qf = F.col("vec_id") % 50 == 0
    brute = {(r["q_id"], r["neighbor_id"]) for r in brute_topk(vecs, qf, ANN_TOPK).collect()}
    lsh = {(r["q_id"], r["neighbor_id"]) for r in lsh_topk(spark, vecs, qf).collect()}
    ivf = {
        (r["q_id"], r["neighbor_id"])
        for r in ivf_topk(vecs, qf, F.col("vec_id") % 37 == 1).collect()
    }
    lsh_recall = len(brute & lsh) / len(brute)
    ivf_recall = len(brute & ivf) / len(brute)
    print(f"clustered recall@{ANN_TOPK}: lsh={lsh_recall:.3f} ivf={ivf_recall:.3f}")
    assert lsh_recall >= 0.9, lsh_recall
    assert ivf_recall >= 0.9, ivf_recall


def test_ann_lsh_recall_vs_brute(spark, sf_dir):
    """Multi-band OR-construction recall: the ANN top-3 must recover most
    of the exact top-3 (nearest vectors are bucket-collision-likely by
    construction). Reported per round in BENCH/BASELINE.md."""
    from docling_fast_server_spark.operators.similarity import (
        ANN_TOPK,
        q_sim_ann_lsh,
        q_sim_topk_brute,
    )

    brute = {
        (r["q_id"], r["neighbor_id"])
        for r in q_sim_topk_brute(spark, sf_dir).collect()
        if r["rank"] <= ANN_TOPK
    }
    ann = {
        (r["q_id"], r["neighbor_id"]) for r in q_sim_ann_lsh(spark, sf_dir).collect()
    }
    recall = len(brute & ann) / len(brute)
    print(f"ann_lsh recall@{ANN_TOPK} = {recall:.3f}")
    assert recall >= 0.6, recall

    from docling_fast_server_spark.operators.similarity import q_sim_ann_ivf

    ivf = {
        (r["q_id"], r["neighbor_id"]) for r in q_sim_ann_ivf(spark, sf_dir).collect()
    }
    ivf_recall = len(brute & ivf) / len(brute)
    print(f"ann_ivf recall@{ANN_TOPK} = {ivf_recall:.3f}")
    # single-cell IVF over near-uniform vectors is the IVF worst case too;
    # nprobe>1 is the production recall knob
    assert ivf_recall >= 0.2, ivf_recall


def test_poly_hash_unicode_safe_and_cross_engine(spark):
    """The exact-dedup fold moduli are sized so acc*base + 0x10FFFF
    stays below 2^63 — F.ascii()/DuckDB ascii() return full CODE POINTS,
    not bytes, so the naive 'largest prime for +255 headroom' choice
    silently wrapped on Spark (and errored on DuckDB) for any character
    above U+0A9D. Assert bit-exact agreement on strings spanning the
    whole range, including the maximal code point."""
    import duckdb
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators.dedup import (
        EXACT_B1,
        EXACT_B2,
        EXACT_P1,
        EXACT_P2,
        poly_hash,
        poly_hash_sql,
    )

    texts = [
        "plain ascii",
        "euro € sign",
        "cjk 漢字",
        "astral \U0001F600 emoji",
        "max \U0010FFFF cp",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: (r["h1"], r["h2"])
        for r in df.select(
            "text",
            poly_hash(F.col("text"), EXACT_B1, EXACT_P1).alias("h1"),
            poly_hash(F.col("text"), EXACT_B2, EXACT_P2).alias("h2"),
        ).collect()
    }
    con = duckdb.connect()
    for t in texts:
        want = con.execute(
            f"SELECT {poly_hash_sql('text', EXACT_B1, EXACT_P1)}, "
            f"{poly_hash_sql('text', EXACT_B2, EXACT_P2)} FROM (SELECT ? AS text)",
            [t],
        ).fetchone()
        assert got[t] == tuple(want), (t, got[t], want)
    con.close()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filters=st.lists(st.integers(min_value=0, max_value=4), min_size=12, max_size=12),
    level=st.sampled_from([0, 1, 6, 9]),
)
def test_png_decoder_roundtrip_any_image(w, h, seed, filters, level):
    """Property: for ANY pixel grid, ANY per-row filter assignment
    (all five public types), and ANY deflate level, a spec-conformant
    PNG encodes such that _decode_png recovers exact dims and the exact
    decoded pixel sum. The production encoder only emits filters 0-2 at
    level 0 — this pins the decoder's full generality."""
    import struct
    import zlib

    from docling_fast_server_spark.operators.multimodal import _decode_png

    rng = random.Random(seed)
    stride = 3 * w
    pix = [bytes(rng.randrange(256) for _ in range(stride)) for _ in range(h)]

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytes(stride)
    for r, row in enumerate(pix):
        ft = filters[r]
        raw.append(ft)
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            up = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (a + up) // 2
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            raw.append((row[i] - pred) & 0xFF)
        prev = row
    f = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )
    assert _decode_png(f) == (w, h, sum(sum(r) for r in pix))


def test_banded_buckets_kernel_matches_hof_reference(spark, sf_dir):
    """The vectorized banding kernel (numpy left-to-right plane dots)
    must produce bit-identical (vec_id, band, key, v) rows to the pure
    HOF reference at BOTH production plane configurations."""
    from docling_fast_server_spark.operators import dedup
    from docling_fast_server_spark.operators import similarity as S

    vecs = S._vecs(spark, sf_dir)
    for bands, ppb in [
        (S.ANN_BANDS, S.ANN_PLANES_PER_BAND),
        (dedup.EMB_BANDS, dedup.EMB_PLANES_PER_BAND),
    ]:
        got = {
            (r.vec_id, r.band): (r.key, tuple(r.keys), tuple(r.v))
            for r in S.banded_buckets(spark, vecs, bands, ppb).collect()
        }
        want = {
            (r.vec_id, r.band): (r.key, tuple(r.keys), tuple(r.v))
            for r in S.banded_buckets_hof(spark, vecs, bands, ppb).collect()
        }
        assert got == want and len(got) > 0


def test_dot_route_equivalence(spark, sf_dir):
    """The scale-routed dot (r8: HOF fold below CODEGEN_MIN_ROWS, the
    codegen-unrolled sum above) can never change a result: both forms
    associate left-to-right from the same seed, so the FULL output rows
    (ranks and cos_sim included) must be identical under either route,
    and the router must pick the HOF form at gate scale."""
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators import similarity as S

    assert S._route_dot(sf_dir) == "hof"  # 500 rows < CODEGEN_MIN_ROWS
    assert S._parquet_num_rows(f"{sf_dir}/embeddings.parquet") == 500
    assert S._parquet_num_rows("/nonexistent/path") is None

    vecs = S._vecs(spark, sf_dir)
    qf = F.col("vec_id") % S.QUERY_MOD == 0
    for q in (
        lambda dot: S.brute_topk(vecs, qf, S.TOPK, dot=dot),
        lambda dot: S.lsh_topk(spark, vecs, qf, dot=dot),
    ):
        hof = sorted(map(tuple, q("hof").collect()))
        unrolled = sorted(map(tuple, q("unrolled").collect()))
        assert hof == unrolled and len(hof) > 0
