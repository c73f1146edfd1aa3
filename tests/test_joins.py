"""Bucketed co-located joins (no exchange) and skew-salted joins
(identical results, split hot keys)."""

import pytest
from pyspark.sql import functions as F

from docling_fast_server_spark.plans.joins import bucketed_join, salted_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield ("b_orders", "b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # at test scale Catalyst would broadcast (bucketing "disabled by query
    # planner"); disable auto-broadcast to emulate two at-scale sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        plan = _plan(joined.groupBy("o_orderstatus").count())
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # correctness: row count equals the plain join
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert joined.count() == plain


def test_salted_join_matches_plain_join(spark, sf_dir):
    # a skewed big side: every lineitem of the hottest order duplicated 50x
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    hot = li.limit(1).select("k").collect()[0]["k"]
    skewed = li.unionByName(
        li.filter(F.col("k") == hot).crossJoin(
            spark.range(50).select(F.lit(1).alias("_x"))
        ).drop("_x")
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("k"), "o_orderpriority")
    )
    a = salted_join(skewed, dim, "k", salt_n=8)
    b = skewed.join(dim, "k")
    assert a.count() == b.count()
    ga = {r["k"]: r["n"] for r in a.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    gb = {r["k"]: r["n"] for r in b.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert ga == gb
