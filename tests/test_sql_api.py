"""SQL API surface: the extracted corpus is queryable via spark.sql on
temp views — a user of the reference switching to this engine can run
plain SQL over spans (the query-capabilities parity claim)."""

from docling_fast_server_spark.queries import extract_all


def test_sql_over_extracted_spans(spark, sf_dir):
    extract_all(spark, sf_dir).createOrReplaceTempView("docs_spans")
    out = spark.sql(
        """
        SELECT s.kind, COUNT(*) AS n, SUM(LENGTH(s.text)) AS chars
        FROM docs_spans LATERAL VIEW explode(spans) AS s
        GROUP BY s.kind ORDER BY n DESC
        """
    ).collect()
    kinds = {r["kind"] for r in out}
    assert {"text", "section_header"} <= kinds
    assert all(r["n"] > 0 for r in out)

    top = spark.sql(
        """
        SELECT doc_id, SIZE(spans) AS n_spans FROM docs_spans
        ORDER BY n_spans DESC, doc_id LIMIT 5
        """
    ).collect()
    assert len(top) == 5 and top[0]["n_spans"] >= top[-1]["n_spans"]
