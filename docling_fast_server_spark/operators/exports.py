"""Serialization exports — markdown / html / doctags / canonical json.

The reference materializes four serializations from one converted document
(/root/reference/src/services/pdf_processor.py:203-224: export_to_doctags/
dict/markdown/html) — all pure functions of the item tree in reading order
(output.json:1 .files.markdown: '## ' per section_header, body order
preserved; ImageRefMode.EMBEDDED inlines media by reference).

Here they are pure functions of the spans array, built entirely from
JVM-side expressions (transform + array_join inside whole-stage codegen):
no Python in the hot path, so the export stage adds no Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import (
    K_CODE,
    K_FORMULA,
    K_KEY_VALUE,
    K_PICTURE,
    K_SECTION_HEADER,
    K_TABLE,
    K_TEXT,
)


def _render_md(s: Column) -> Column:
    return (
        F.when(s["kind"] == K_SECTION_HEADER, F.concat(F.lit("## "), s["text"]))
        .when(s["kind"] == K_TEXT, s["text"])
        .when(s["kind"] == K_KEY_VALUE, F.concat(F.lit("- "), s["text"]))
        .when(s["kind"] == K_CODE, F.concat(F.lit("```\n"), s["text"], F.lit("\n```")))
        .when(s["kind"] == K_FORMULA, F.concat(F.lit("$$ "), s["text"], F.lit(" $$")))
        .when(s["kind"] == K_TABLE, F.concat(F.lit("| "), s["text"], F.lit(" |")))
        # coalesce: a ref-less picture (kernel-emittable — a <figure>
        # with no <img src>) must still render, or the dropped span
        # shifts every later offset on re-ingest (ADVICE r05); readers
        # map the empty ref back to None
        .when(
            s["kind"] == K_PICTURE,
            F.concat(
                F.lit("![image]("), F.coalesce(s["media_ref"], F.lit("")), F.lit(")")
            ),
        )
        .otherwise(F.coalesce(s["text"], F.lit("")))
    )


def _xml_escape(c: Column) -> Column:
    """Entity-escape element content (& first, then < and >) — all
    JVM-side `replace` chains inside whole-stage codegen."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def _attr_escape(c: Column) -> Column:
    """Attribute-value escape: content escape + double-quote entity."""
    return F.replace(_xml_escape(c), F.lit('"'), F.lit("&quot;"))


def _render_html(s: Column) -> Column:
    text = _xml_escape(s["text"])
    # coalesce: concat null-propagates, so a NULL ref would silently drop
    # the whole table/picture element from the export (ADVICE r05); the
    # html reader maps the empty attribute back to None
    ref = _attr_escape(F.coalesce(s["media_ref"], F.lit("")))
    # split the raw kv text first, escape each part for element content
    kv_k = _xml_escape(F.substring_index(s["text"], ": ", 1))
    kv_v = _xml_escape(F.substring_index(s["text"], ": ", -1))
    return (
        F.when(s["kind"] == K_SECTION_HEADER, F.concat(F.lit("<h2>"), text, F.lit("</h2>")))
        .when(s["kind"] == K_TEXT, F.concat(F.lit("<p>"), text, F.lit("</p>")))
        .when(
            s["kind"] == K_KEY_VALUE,
            F.concat(F.lit("<dl><dt>"), kv_k, F.lit("</dt><dd>"), kv_v, F.lit("</dd></dl>")),
        )
        .when(s["kind"] == K_CODE, F.concat(F.lit("<pre><code>"), text, F.lit("</code></pre>")))
        .when(s["kind"] == K_FORMULA, F.concat(F.lit('<div class="math">'), text, F.lit("</div>")))
        .when(
            s["kind"] == K_TABLE,
            F.concat(F.lit('<table data-ref="'), ref, F.lit('">'), text, F.lit("</table>")),
        )
        .when(s["kind"] == K_PICTURE, F.concat(F.lit('<img src="'), ref, F.lit('"/>')))
        .otherwise(F.coalesce(text, F.lit("")))
    )


def _render_doctags(s: Column) -> Column:
    # body entity-escaped: a raw `<` or `&` in span text would make the
    # tag stream ambiguous for any downstream doctags consumer
    body = _xml_escape(F.coalesce(s["text"], s["media_ref"], F.lit("")))
    return F.concat(F.lit("<"), s["kind"], F.lit(">"), body, F.lit("</"), s["kind"], F.lit(">"))


def _json_escape(c: Column) -> Column:
    """JSON string-body escape: backslash FIRST, then double-quote.
    Control characters are excluded by the span-text contract (words +
    single spaces — the extraction kernels never emit them), so the two
    replaces make every export parse with a strict JSON parser."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    return F.replace(c, F.lit('"'), F.lit('\\"'))


def _render_json(s: Column) -> Column:
    """Canonical one-line JSON per span (stable field order, nulls kept) —
    engine-neutral so the DuckDB oracle can reproduce it with string
    concatenation. The export_to_dict analog (pdf_processor.py:211)."""

    def q(c: Column) -> Column:
        return F.when(c.isNull(), F.lit("null")).otherwise(
            F.concat(F.lit('"'), _json_escape(c), F.lit('"'))
        )

    return F.concat(
        F.lit('{"kind":'), q(s["kind"]),
        F.lit(',"text":'), q(s["text"]),
        F.lit(',"media_ref":'), q(s["media_ref"]),
        F.lit(',"offset":'), s["offset"].cast("string"),
        F.lit("}"),
    )


def spans_to_markdown(spans: Column) -> Column:
    return F.array_join(F.transform(spans, _render_md), "\n\n")


def spans_to_html(spans: Column) -> Column:
    return F.array_join(F.transform(spans, _render_html), "\n")


def spans_to_doctags(spans: Column) -> Column:
    return F.array_join(F.transform(spans, _render_doctags), "\n")


def spans_to_json(spans: Column) -> Column:
    return F.concat(F.lit("["), F.array_join(F.transform(spans, _render_json), ","), F.lit("]"))


# ---------------------------------------------------------------------------
# Python twins of the JVM renderers (r8) — used by the fused
# extract+render kernel (dispatch.gen_extract_render_auto) so the export
# queries serialize ONE string per document out of the Python boundary
# instead of the whole spans array plus an interpreted HOF render pass.
# Byte-exact mirrors of _render_* above (same branch order, same escape
# chains, same substring_index / array_join-null semantics);
# test_exports_fused_matches_jvm pins equality against with_exports on
# the real corpus.
# ---------------------------------------------------------------------------
def _xml_escape_py(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _attr_escape_py(s: str) -> str:
    return _xml_escape_py(s).replace('"', "&quot;")


def _json_escape_py(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _render_md_py(kind, text, ref):
    if kind == K_SECTION_HEADER:
        return None if text is None else "## " + text
    if kind == K_TEXT:
        return text
    if kind == K_KEY_VALUE:
        return None if text is None else "- " + text
    if kind == K_CODE:
        return None if text is None else "```\n" + text + "\n```"
    if kind == K_FORMULA:
        return None if text is None else "$$ " + text + " $$"
    if kind == K_TABLE:
        return None if text is None else "| " + text + " |"
    if kind == K_PICTURE:
        return "![image](" + (ref or "") + ")"
    return text or ""


def _substring_index_py(s: str, delim: str, count: int) -> str:
    # Spark substring_index: count=1 -> before the FIRST delim (whole
    # string if absent); count=-1 -> after the LAST delim
    if count == 1:
        i = s.find(delim)
        return s if i < 0 else s[:i]
    i = s.rfind(delim)
    return s if i < 0 else s[i + len(delim):]


def _render_html_py(kind, text, ref):
    e = _xml_escape_py
    if kind == K_SECTION_HEADER:
        return None if text is None else "<h2>" + e(text) + "</h2>"
    if kind == K_TEXT:
        return None if text is None else "<p>" + e(text) + "</p>"
    if kind == K_KEY_VALUE:
        if text is None:
            return None
        return (
            "<dl><dt>" + e(_substring_index_py(text, ": ", 1))
            + "</dt><dd>" + e(_substring_index_py(text, ": ", -1)) + "</dd></dl>"
        )
    if kind == K_CODE:
        return None if text is None else "<pre><code>" + e(text) + "</code></pre>"
    if kind == K_FORMULA:
        return None if text is None else '<div class="math">' + e(text) + "</div>"
    if kind == K_TABLE:
        if text is None:
            return None
        return (
            '<table data-ref="' + _attr_escape_py(ref or "") + '">'
            + e(text) + "</table>"
        )
    if kind == K_PICTURE:
        return '<img src="' + _attr_escape_py(ref or "") + '"/>'
    return "" if text is None else e(text)


def _render_doctags_py(kind, text, ref):
    body = text if text is not None else ref
    return "<" + kind + ">" + _xml_escape_py(body or "") + "</" + kind + ">"


def _render_json_py(kind, text, ref, offset):
    def q(v):
        return "null" if v is None else '"' + _json_escape_py(v) + '"'

    return (
        '{"kind":' + q(kind) + ',"text":' + q(text)
        + ',"media_ref":' + q(ref) + ',"offset":' + str(offset) + "}"
    )


def render_doc_py(fmt: str, kinds, texts, refs, offsets) -> str:
    """One document's export string from parallel span lists — the
    array_join semantics of the JVM path (null renders are SKIPPED, no
    separator; a null doctags render cannot occur)."""
    if fmt == "markdown":
        parts = [_render_md_py(k, t, r) for k, t, r in zip(kinds, texts, refs)]
        return "\n\n".join(p for p in parts if p is not None)
    if fmt == "html":
        parts = [_render_html_py(k, t, r) for k, t, r in zip(kinds, texts, refs)]
        return "\n".join(p for p in parts if p is not None)
    if fmt == "doctags":
        return "\n".join(
            _render_doctags_py(k, t, r) for k, t, r in zip(kinds, texts, refs)
        )
    if fmt == "doc_json":
        return (
            "["
            + ",".join(
                _render_json_py(k, t, r, o)
                for k, t, r, o in zip(kinds, texts, refs, offsets)
            )
            + "]"
        )
    raise ValueError(f"unknown export format {fmt!r}")


def with_exports(df, spans_col: str = "spans"):
    """Fan out all four serializations — the get_output() analog
    (pdf_processor.py:203-224). One narrow projection, zero shuffles."""
    s = F.col(spans_col)
    return df.withColumns(
        {
            "markdown": spans_to_markdown(s),
            "html": spans_to_html(s),
            "doctags": spans_to_doctags(s),
            "doc_json": spans_to_json(s),
        }
    )


EXPORT_FORMATS = ("markdown", "html", "doctags", "json")
_FORMAT_COL = {"markdown": "markdown", "html": "html", "doctags": "doctags", "json": "doc_json"}


def melt_exports(df, spans_col: str = "spans"):
    """(doc_id, format, payload): the four serializations as rows — the
    melt that feeds the per-format partitioned sink. Narrow (withColumns
    + explode of a 4-element literal array)."""
    structs = [
        F.struct(F.lit(fmt).alias("format"), F.col(col).alias("payload"))
        for fmt, col in _FORMAT_COL.items()
    ]
    return (
        with_exports(df, spans_col)
        .select("doc_id", F.explode(F.array(*structs)).alias("fp"))
        .select("doc_id", F.col("fp.format").alias("format"), F.col("fp.payload").alias("payload"))
    )


def write_exports_partitioned(df, path: str, compression: str = "zstd") -> None:
    """S9 per-format sink + S6 explicit compression: write the melted
    exports PARTITIONED BY (format) with zstd. The reference writes each
    serialization to its own output prefix (tests/runpod_integration.py:
    160-190) and gzips responses/archives (src/main.py:23,
    queue_manager.py:443-469); the columnar analog is one partitioned
    table whose per-format readers scan ONLY their partition (partition
    pruning — asserted in tests/test_exports_sink.py) with a modern
    codec set explicitly rather than inherited defaults."""
    (
        melt_exports(df)
        .write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("format")
        .parquet(path)
    )


def read_export_spans(spark, path: str, fmt: str):
    """Re-hydrate documents from the S9 partitioned export store: scan
    ONLY the requested format's partition (pruned — asserted in
    tests/test_exports_sink.py) and run the matching serialization
    reader (md_ingest) back to spans. Closes the loop: export store ->
    first-class raw input, with each format's documented lossiness
    (json and html are exact; html keeps table media_refs via
    data-ref)."""
    from .md_ingest import (
        extract_doctags,
        extract_html_export,
        extract_json,
        extract_markdown,
    )

    readers = {
        "markdown": extract_markdown,
        "doctags": extract_doctags,
        "json": extract_json,
        "html": extract_html_export,
    }
    if fmt not in readers:
        raise ValueError(f"no reader for export format {fmt!r} (have {sorted(readers)})")
    part = (
        spark.read.parquet(path)
        .filter(F.col("format") == fmt)
        .select("doc_id", "payload")
    )
    return readers[fmt](part, "payload")
