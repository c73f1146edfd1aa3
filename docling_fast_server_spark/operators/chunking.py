"""Hybrid chunking — token-budget segmentation over ordered spans, with
heading-context propagation, oversize-span splitting, and a whole-doc
fallback row.

The reference chunks each converted document with docling's HybridChunker
(/root/reference/src/services/pdf_processor.py:36-69: lazy init, chunk,
error-fallback to one whole-document chunk; the placeholder route
src/routes/placeholder.py:12-15 confirms chunking is a standalone op).
HybridChunker is tokenizer-aware, carries section context into each chunk,
and splits items larger than the budget; this operator re-expresses each
of those contracts relationally:

- heading context: every span carries the most recent section_header at
  or before it (last-ignore-nulls window per doc); a chunk reports the
  heading active at its first piece.
- oversize splitting: a span with more tokens than the budget explodes
  into ceil(n_tok/budget) pieces of at most `budget` tokens each, so no
  chunk is ever forced past the budget by a single long span.
- whole-doc fallback: a document that yields no chunkable pieces (e.g.
  failed extraction with an empty spans array) still emits exactly one
  empty chunk row — a document is never silently dropped by the chunker
  (the except-branch of pdf_processor.py:60-69). Implemented with
  explode_outer, so the fallback costs nothing: no anti-join, no second
  pass over the extraction kernel.

All pure DataFrame code: the only exchange is the hash partition on
doc_id for the per-doc windows; piece explosion and slicing are narrow
higher-order expressions. Exactly reproducible in ANSI SQL (oracle in
queries.py).

Media spans (text IS NULL) contribute zero tokens and are excluded from
chunk text but counted in n_spans, mirroring HybridChunker's text-only
token budget with preserved item references.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..model import K_SECTION_HEADER

DEFAULT_BUDGET = 40  # tokens per chunk
# composite (offset, piece_i) ordering key: offsets and piece indices are
# both far below 2^20 at any realistic document size
_KEY_SHIFT = 1 << 20


def _tok_arr(col, tokenizer: str):
    """The token array the budget counts: whitespace words ("ws", the
    HybridChunker default proxy) or the BPE-ish pre-tokenization
    ("bpe": alnum runs + per-punctuation tokens, textstats.BPE_RE) —
    the tokenizer-aware budget of the reference's HybridChunker
    (pdf_processor.py:44-58 budgets real tokenizer tokens). Both are
    narrow JVM-side expressions with exact DuckDB analogs."""
    if tokenizer == "ws":
        return F.split(col, " ")
    if tokenizer == "bpe":
        from .textstats import BPE_RE

        return F.regexp_extract_all(col, F.lit(BPE_RE), F.lit(0))
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def chunk_spans(
    df, budget: int = DEFAULT_BUDGET, spans_col: str = "spans", tokenizer: str = "ws"
):
    """DataFrame(doc_id, spans, ...) -> DataFrame(doc_id, chunk_idx,
    heading, chunk_text, n_tokens, n_spans).

    Ordering contract: ord_key = offset * 2^20 + piece_i relies on
    per-document offset UNIQUENESS, which the extraction kernels
    guarantee (offsets are the dense span index, corpus.expected_spans)
    and tests assert at the extraction boundary
    (test_chunking.test_offsets_unique_per_doc)."""
    ex = df.select("doc_id", F.explode_outer(spans_col).alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.offset").alias("offset"),
        F.col("s.text").alias("text"),
        F.when(F.col("s.text").isNull(), F.lit(0))
        .otherwise(F.size(_tok_arr(F.col("s.text"), tokenizer)))
        .alias("n_tok"),
    )
    wh = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ex = ex.withColumn(
        "heading",
        F.coalesce(
            F.last(
                F.when(F.col("kind") == K_SECTION_HEADER, F.col("text")), ignorenulls=True
            ).over(wh),
            F.lit(""),
        ),
    )
    pieces = (
        ex.withColumn(
            "n_pieces",
            F.greatest(F.ceil(F.col("n_tok") / budget), F.lit(1)).cast("int"),
        )
        .select(
            "doc_id",
            "offset",
            "heading",
            "text",
            "n_tok",
            F.explode(F.sequence(F.lit(0), F.col("n_pieces") - 1)).alias("piece_i"),
        )
        .select(
            "doc_id",
            "offset",
            "heading",
            "piece_i",
            F.when(F.col("text").isNull(), F.lit(None).cast("string"))
            .otherwise(
                F.array_join(
                    F.slice(
                        _tok_arr(F.col("text"), tokenizer),
                        F.col("piece_i") * budget + 1,
                        budget,
                    ),
                    " ",
                )
            )
            .alias("p_text"),
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(F.least(F.lit(budget), F.col("n_tok") - F.col("piece_i") * budget))
            .alias("p_tok"),
        )
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("offset", "piece_i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pieces = pieces.withColumn(
        "chunk_idx",
        F.floor(F.coalesce(F.sum("p_tok").over(wc), F.lit(0)) / budget).cast("int"),
    )
    # explode_outer row for an empty doc has NULL offset/text: it flows
    # through as one zero-token NULL piece and lands as a single empty
    # chunk (countDistinct skips the NULL offset) — the whole-doc
    # fallback without any extra pass
    key = (F.coalesce(F.col("offset"), F.lit(0)).cast("long") * _KEY_SHIFT + F.col("piece_i")).alias("ord_key")
    return (
        pieces.withColumn("ord_key", key)
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.min_by("heading", F.col("ord_key")).alias("heading"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("ord_key", "p_text"))),
                        lambda st: st["p_text"].isNotNull(),
                    ),
                    lambda st: st["p_text"],
                ),
                " ",
            ).alias("chunk_text"),
            F.sum("p_tok").cast("long").alias("n_tokens"),
            F.countDistinct("offset").cast("long").alias("n_spans"),
        )
    )
