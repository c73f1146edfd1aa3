"""Scale-join strategies: bucketed co-located joins and skew salting.

The two levers the north rule names beyond broadcast:

- **Bucketing**: persist both sides pre-hashed on the join key so the
  sort-merge join reads co-located buckets with NO exchange at query
  time. At 100 TB this is how the docs↔media and docs↔committed-output
  joins avoid reshuffling petabytes per run (Iceberg: write.distribution-
  mode + bucket partition transform; Spark tables: bucketBy).
- **Salting**: a hot key (one domain contributing 10% of all documents)
  overwhelms one reducer in a shuffle join. Explode the small side into
  SALT_N copies and spread the big side's hot rows across salts; the join
  key becomes (key, salt) and the hot partition splits N ways. AQE's
  skew-join split handles sort-merge cases adaptively; explicit salting
  is the deterministic fallback that also works for aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int, sort: bool = True
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables; the plan must show no Exchange on
    either side (verified in tests/test_joins.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt_n: int = 8
) -> DataFrame:
    """Skew-safe equi-join: big side salted by a deterministic hash of its
    full row identity, small side exploded into salt_n replicas. Output
    equals big ⋈ small exactly; the hot key's rows land on salt_n
    reducers instead of one."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
