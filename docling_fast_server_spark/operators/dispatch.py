"""Combined extraction kernel — one pass, per-document format dispatch.

The reference routes every upload through one converter entry point that
picks the pipeline per format (DocumentConverter with format_options,
/root/reference/src/services/pdf_processor.py:176-189). The Spark analog:
a single mapInPandas over the mixed corpus that dispatches per row on the
raw span kind — one scan, one Arrow round-trip, no union of two branches
re-reading the same table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..model import DOCS_EXTRACTED_SCHEMA, METHOD_DEFAULT, METHOD_FAILED
from .html_extract import extract_html_document
from .pdf_layout import extract_pdf_document


def _extract_auto_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        # columnar accumulation: pd.DataFrame(list-of-dicts) re-infers the
        # schema row by row and costs ~2x more than dict-of-lists at this
        # batch size — measurable at 32 workers where per-doc kernel time
        # is a few hundred microseconds
        ids, spans_col, methods, errors = [], [], [], []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            try:
                if len(spans) > 0 and spans[0]["kind"] == "html":
                    html = "\n".join(
                        s["text"] for s in spans if s["kind"] == "html" and s["text"]
                    )
                    out = extract_html_document(doc_id, html)
                    method, err = METHOD_DEFAULT, None
                else:
                    out, method = extract_pdf_document(spans)
                    err = None
            except Exception as e:
                out, method, err = [], METHOD_FAILED, str(e)[:500]
            ids.append(doc_id)
            spans_col.append(out)
            methods.append(method)
            errors.append(err)
        yield pd.DataFrame(
            {"doc_id": ids, "spans": spans_col, "conversion_method": methods, "error": errors}
        )


def extract_auto(df):
    """DataFrame(doc_id, spans raw) -> extracted spans; format dispatched
    per document. Narrow map stage — zero shuffles end to end."""
    return df.select("doc_id", "spans").mapInPandas(
        _extract_auto_batches, schema=DOCS_EXTRACTED_SCHEMA
    )
