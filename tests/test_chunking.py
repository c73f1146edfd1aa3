"""HybridChunker fidelity contracts (pdf_processor.py:44-69): heading
context propagation, oversize-span splitting, whole-doc fallback."""

from pyspark.sql import functions as F

from docling_fast_server_spark.operators.chunking import chunk_spans


def _doc(spark, doc_id, spans):
    rows = [
        (doc_id, [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ])
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_heading_context_propagates(spark):
    df = _doc(
        spark,
        "d1",
        [
            ("section_header", "INTRO", None),
            ("text", "one two three", None),
            ("section_header", "METHODS", None),
            ("text", "four five six", None),
        ],
    )
    chunks = {r["chunk_idx"]: r for r in chunk_spans(df, budget=5).collect()}
    # chunk 0 starts under INTRO; the chunk crossing METHODS starts there
    assert chunks[0]["heading"] == "INTRO"
    assert any(r["heading"] == "METHODS" for r in chunks.values())


def test_oversize_span_splits(spark):
    long_text = " ".join(f"w{i}" for i in range(23))
    df = _doc(spark, "d1", [("text", long_text, None)])
    rows = sorted(chunk_spans(df, budget=8).collect(), key=lambda r: r["chunk_idx"])
    # 23 tokens / budget 8 -> chunks of 8, 8, 7
    assert [r["n_tokens"] for r in rows] == [8, 8, 7]
    assert " ".join(r["chunk_text"] for r in rows) == long_text
    # all three chunks reference the single source span
    assert all(r["n_spans"] == 1 for r in rows)


def test_whole_doc_fallback_on_empty_spans(spark):
    df = _doc(spark, "failed-doc", [])
    rows = chunk_spans(df, budget=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["chunk_idx"], r["heading"], r["chunk_text"]) == (
        "failed-doc", 0, "", "",
    )
    assert (r["n_tokens"], r["n_spans"]) == (0, 0)


def test_media_spans_kept_but_textless(spark):
    df = _doc(
        spark,
        "d1",
        [
            ("text", "a b", None),
            ("picture", None, "media://1/img/0"),
            ("text", "c d", None),
        ],
    )
    rows = chunk_spans(df, budget=40).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c d"
    assert rows[0]["n_spans"] == 3
    assert rows[0]["n_tokens"] == 4


def test_offsets_unique_per_doc(spark, sf_dir):
    """Extraction-boundary contract the chunker's ord_key (offset * 2^20
    + piece_i) depends on: span offsets are unique within a document
    (they are the dense span index by construction; a duplicate would
    make chunk piece order nondeterministic and undercount n_spans)."""
    from pyspark.sql import functions as F

    from docling_fast_server_spark.queries import extract_all

    ex = extract_all(spark, sf_dir).select("doc_id", F.explode("spans").alias("s"))
    dup = (
        ex.groupBy("doc_id", F.col("s.offset").alias("offset"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def _model_chunks(spans, B, tokenizer="ws"):
    """Independent Python model of the chunker contract (the row-window
    formulation the oracle uses): running heading, piece explosion with
    actual cumulative token counts, floor(cum/B) chunk assignment."""
    import re

    def toks(t):
        if tokenizer == "ws":
            return t.split(" ")
        return re.findall(r"[A-Za-z0-9]+|[^A-Za-z0-9 ]", t)

    spans = sorted(spans, key=lambda s: s["offset"])
    heading, cum, pieces = "", 0, []
    for s in spans:
        if s["kind"] == "section_header":
            heading = s["text"]
        tk = [] if s["text"] is None else toks(s["text"])
        n = 0 if s["text"] is None else len(tk)
        for p in range(max(-(-n // B), 1)):
            ptext = None if s["text"] is None else " ".join(tk[p * B : (p + 1) * B])
            ptok = 0 if s["text"] is None else min(B, n - p * B)
            pieces.append((cum // B, heading, s["offset"], ptext, ptok))
            cum += ptok
    if not pieces:
        return [(0, "", "", 0, 0)]
    chunks = {}
    for ci, h, off, ptext, ptok in pieces:
        chunks.setdefault(ci, []).append((h, off, ptext, ptok))
    return [
        (
            ci,
            mem[0][0],
            " ".join(t for _, _, t, _ in mem if t is not None),
            sum(pt for _, _, _, pt in mem),
            len({o for _, o, _, _ in mem}),
        )
        for ci, mem in sorted(chunks.items())
    ]


def test_chunker_matches_model_on_arbitrary_spans(spark):
    """The within-array HOF chunker vs an independent Python model on
    adversarial span soups: empty docs, media-only docs, empty-string
    texts, budget-boundary totals, shuffled offsets, headers anywhere."""
    import random

    from pyspark.sql import types as T

    from docling_fast_server_spark.operators.chunking import chunk_spans

    rng = random.Random(20260816)
    words = ["aa", "b", "ccc", "dd", ""]
    docs = []
    for doc_i in range(40):
        n_spans = rng.randrange(0, 9)
        offsets = rng.sample(range(100), n_spans)
        spans = []
        for off in offsets:
            kind = rng.choice(["text", "text", "section_header", "picture"])
            if kind == "picture":
                spans.append({"kind": kind, "text": None, "media_ref": f"m{off}", "offset": off})
            else:
                txt = " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12)))
                spans.append({"kind": kind, "text": txt, "media_ref": None, "offset": off})
        docs.append((f"d{doc_i}", spans))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("kind", T.StringType()),
                            T.StructField("text", T.StringType()),
                            T.StructField("media_ref", T.StringType()),
                            T.StructField("offset", T.IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(docs, schema)
    for B, tokenizer in ((3, "ws"), (5, "bpe")):
        got = {}
        for r in chunk_spans(df, budget=B, tokenizer=tokenizer).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["heading"], r["chunk_text"], r["n_tokens"], r["n_spans"])
            )
        for doc_id, spans in docs:
            want = _model_chunks(spans, B, tokenizer)
            assert sorted(got.get(doc_id, [])) == sorted(want), (
                tokenizer,
                doc_id,
                spans,
                sorted(got.get(doc_id, [])),
                sorted(want),
            )


# ---------------------------------------------------------------------------
# round-4 verdict item 6: quadratic-fold tripwire — the row-window
# formulation must exist, match the HOF exactly, and absorb pathological
# >20k-span documents that the in-array prefix fold would turn into a
# minutes-long single task.
# ---------------------------------------------------------------------------
def _multi_doc(spark, docs):
    rows = [
        (
            doc_id,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": i}
                for i, (k, t, m) in enumerate(spans)
            ],
        )
        for doc_id, spans in docs
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


_MIXED_DOCS = [
    ("d-empty", []),
    ("d-media", [("picture", None, "media://1/img/0")]),
    (
        "d-small",
        [
            ("section_header", "HEAD ONE", None),
            ("text", "a b c d e f g", None),
            ("picture", None, "media://2/img/1"),
        ],
    ),
    (
        "d-long",
        [
            ("text", " ".join(f"w{i}" for i in range(23)), None),
            ("section_header", "LATE HEAD", None),
            ("text", "x y z", None),
            ("table", "c1 | c2 | c3", "media://3/tbl/2"),
            ("text", " ".join(f"v{i}" for i in range(11)), None),
        ],
    ),
]


def test_window_route_matches_hof(spark):
    df = _multi_doc(spark, [d for d in _MIXED_DOCS if d[1]])  # non-empty docs
    for tokenizer in ("ws", "bpe"):
        a = sorted(
            map(tuple, chunk_spans(df, budget=5, tokenizer=tokenizer, route="hof").collect())
        )
        b = sorted(
            map(tuple, chunk_spans(df, budget=5, tokenizer=tokenizer, route="window").collect())
        )
        assert a == b


def test_auto_route_equals_hof_across_the_ceiling(spark):
    """auto with a tiny ceiling forces some docs through each branch;
    output must equal the pure HOF run (including the empty-doc fallback,
    which always takes the HOF branch)."""
    df = _multi_doc(spark, _MIXED_DOCS)
    a = sorted(map(tuple, chunk_spans(df, budget=5, route="hof").collect()))
    b = sorted(map(tuple, chunk_spans(df, budget=5, route="auto", hof_max_spans=3).collect()))
    assert a == b


def _ref_chunks(spans, B):
    """Independent Python model of the chunk semantics."""
    heading, cum, pieces = "", 0, []
    for s in sorted(spans, key=lambda s: s["offset"]):
        if s["kind"] == "section_header" and s["text"] is not None:
            heading = s["text"]
        toks = s["text"].split(" ") if s["text"] is not None else None
        ntok = len(toks) if toks is not None else 0
        for p in range(max((ntok + B - 1) // B, 1)):
            pieces.append(
                (
                    s["offset"],
                    p,
                    (cum + p * B) // B,
                    heading,
                    " ".join(toks[p * B : (p + 1) * B]) if toks is not None else None,
                    min(B, ntok - p * B) if toks is not None else 0,
                )
            )
        cum += ntok
    out = {}
    for off, p, ci, hd, pt, ptok in pieces:
        c = out.setdefault(ci, {"heading": hd, "texts": [], "n_tokens": 0, "offsets": set()})
        if pt is not None:
            c["texts"].append(pt)
        c["n_tokens"] += ptok
        c["offsets"].add(off)
    return {
        ci: (c["heading"], " ".join(c["texts"]), c["n_tokens"], len(c["offsets"]))
        for ci, c in out.items()
    }


def test_big_doc_completes_via_window_route(spark):
    """A >20k-span document goes through the row-window fallback under
    route='auto' and produces exactly the reference chunking — instead of
    an O(spans^2) fold straggler."""
    n = 25_000
    spans = []
    for i in range(n):
        if i % 500 == 0:
            spans.append({"kind": "section_header", "text": f"H{i}", "media_ref": None, "offset": i})
        elif i % 97 == 13:
            spans.append({"kind": "picture", "text": None, "media_ref": f"media://9/img/{i}", "offset": i})
        else:
            spans.append({"kind": "text", "text": f"a{i} b{i} c{i}", "media_ref": None, "offset": i})
    df = spark.createDataFrame(
        [("d-big", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    rows = chunk_spans(df, budget=40, route="auto").collect()  # default ceiling
    got = {r["chunk_idx"]: (r["heading"], r["chunk_text"], r["n_tokens"], r["n_spans"]) for r in rows}
    assert got == _ref_chunks(spans, 40)


def test_extraction_boundary_enforces_span_ceiling():
    """Kernels degrade a doc beyond MAX_SPANS_PER_DOC to failed (pure
    Python check — no Spark)."""
    import json

    import pytest

    from docling_fast_server_spark.model import MAX_SPANS_PER_DOC
    from docling_fast_server_spark.operators.html_extract import extract_html_document
    from docling_fast_server_spark.operators.pdf_layout import extract_pdf_cells_flat

    html = "<html><body>" + "<p>word</p>" * (MAX_SPANS_PER_DOC + 1) + "</body></html>"
    with pytest.raises(ValueError, match="span ceiling"):
        extract_html_document("doc-000000", html)

    m = MAX_SPANS_PER_DOC + 1
    prov = json.dumps({"p": 1, "l": 72.0, "t": 700.0, "r": 292.0, "b": 684.0, "fs": 11.0, "text": "w"})
    with pytest.raises(ValueError, match="span ceiling"):
        extract_pdf_cells_flat(["pdf_cell"] * m, [prov] * m, [None] * m, 0, m)


def test_auto_route_warns_on_unmaterialized_kernel_input(spark, sf_dir):
    """route='auto' over a fused (non-persisted) extraction plan pays
    double extraction — the guard must surface it; route='hof', a
    persisted input, and plain stored tables must stay silent."""
    import warnings

    import pytest

    from docling_fast_server_spark.corpus import docs_raw
    from docling_fast_server_spark.operators.chunking import chunk_spans
    from docling_fast_server_spark.operators.dispatch import extract_auto

    fused = extract_auto(docs_raw(spark, sf_dir, which="html").limit(5))
    with pytest.warns(RuntimeWarning, match="EXECUTE twice"):
        chunk_spans(fused, route="auto")

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        chunk_spans(fused, route="hof")  # forced route: no double eval
        cached = fused.persist()
        try:
            chunk_spans(cached, route="auto")  # materialized: safe
        finally:
            cached.unpersist()


def test_hof_expr_matches_column_reference(spark, sf_dir):
    """The r8 SQL-string build of the HOF chunker must be row-identical
    to the Column-API reference on the real extracted corpus (both
    tokenizers), including the empty-spans whole-doc fallback."""
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators import chunking as C
    from docling_fast_server_spark.queries import extract_all

    base = extract_all(spark, sf_dir).persist()
    with_empty = base.unionByName(
        base.limit(1).select(
            F.lit("doc-empty").alias("doc_id"),
            F.expr("CAST(array() AS array<struct<kind:string,text:string,"
                   "media_ref:string,offset:int>>)").alias("spans"),
            F.lit("failed").alias("conversion_method"),
            F.lit(None).cast("string").alias("error"),
        )
    )
    for tokenizer, budget in (("ws", 8), ("bpe", 10)):
        got = sorted(map(tuple, C._chunk_spans_hof(
            with_empty, budget=budget, tokenizer=tokenizer).collect()))
        want = sorted(map(tuple, C._chunk_spans_hof_cols(
            with_empty, budget=budget, tokenizer=tokenizer).collect()))
        assert got == want and len(got) > 500
        assert any(r[0] == "doc-empty" for r in got)
    base.unpersist()  # shared-session hygiene: test_escaping asserts
    # zero persistent RDDs survive clear_caches
