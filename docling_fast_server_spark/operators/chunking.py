"""Hybrid chunking — token-budget segmentation over ordered spans.

The reference chunks each converted document with docling's HybridChunker
(/root/reference/src/services/pdf_processor.py:36-69: lazy init, chunk,
error-fallback to one whole-document chunk; the placeholder route
src/routes/placeholder.py:12-15 confirms chunking is a standalone op).

Spark-native re-expression: posexplode the spans array, compute each
span's token count and the running token total with a window, and assign
chunk_idx = floor(tokens_before / budget) — a fixed token-window chunker.
This is pure DataFrame code (whole-stage codegen; the per-doc window is
narrow after a hash partition on doc_id) and is exactly reproducible in
ANSI SQL for the oracle.

Media spans (text IS NULL) contribute zero tokens and are excluded from
chunk text but counted in n_spans, mirroring HybridChunker's text-only
token budget with preserved item references.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 40  # tokens per chunk


def chunk_spans(df, budget: int = DEFAULT_BUDGET, spans_col: str = "spans"):
    """DataFrame(doc_id, spans, ...) -> DataFrame(doc_id, chunk_idx,
    chunk_text, n_tokens, n_spans)."""
    ex = df.select(
        "doc_id", F.posexplode(spans_col).alias("pos", "s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.text").alias("text"),
        F.when(F.col("s.text").isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.col("s.text"), " ")))
        .alias("n_tok"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ex = ex.withColumn(
        "chunk_idx",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget).cast("int"),
    )
    return (
        ex.groupBy("doc_id", "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("offset", "text"))),
                        lambda st: st["text"].isNotNull(),
                    ),
                    lambda st: st["text"],
                ),
                " ",
            ).alias("chunk_text"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_spans"),
        )
    )
