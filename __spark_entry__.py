"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship extraction pipeline at sf0.001 (exploded spans).
queries()     -> every implemented operator (SURVEY.md §2 + training-data
                 pipeline ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()  -> DuckDB-equivalent SQL per query, reconstructing expected
                 results independently from the deterministic corpus spec.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full interleaved-corpus extraction (HTML boilerplate strip
    + PDF layout parse) at sf0.001, exploded to one row per span."""
    from docling_fast_server_spark.queries import q_extract_all_spans

    return q_extract_all_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docling_fast_server_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from docling_fast_server_spark.queries import all_oracles

    return all_oracles()
