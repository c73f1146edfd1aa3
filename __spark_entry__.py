"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship extraction pipeline at sf0.001 (exploded spans).
queries()     -> every implemented operator (SURVEY.md §2 + training-data
                 pipeline ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()  -> DuckDB-equivalent SQL per query, reconstructing expected
                 results independently from the deterministic corpus spec.

The registry holds EXACTLY 50 entries: round 2 registered 52 and the
driver's correctness gate checked precisely the first 50 (media_resize /
media_frame_sample sat at positions 51-52 and were the only operators
without a hard correctness row), so the per-doc textstats trio and the
two media transform kernels are each consolidated into one oracle-gated
query — every column of the former entries is still value-hash-checked.
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
