"""Similarity search over the embeddings table.

Brute-force cosine top-k as the correctness baseline, and a random-
hyperplane LSH-bucketed variant as the scale path (at 100 TB the bucket
assignment is one narrow map, the candidate join shuffles once on the
bucket key, and per-bucket top-k is a bounded window — no all-pairs stage).

Both are pure DataFrame code (zip_with/aggregate dot products inside
whole-stage codegen) and exactly reproducible in DuckDB, including the
deterministic pseudo-random hyperplanes: h_p[d] = ((1 + (p*64+d) *
2654435761) % 97) - 48 — integer arithmetic, identical in both engines.

Ranking is done on round(cos, 3) with vec_id tiebreak: coarse rounding
makes score ties abundant and the id tiebreak resolves them, so 1-ulp
float-summation differences between engines can essentially never flip a
rank. The emitted score IS cos3 — never re-round an already-rounded value
across engines: exact .xx5 decimals round differently under Spark's
shortest-string BigDecimal HALF_UP vs DuckDB's scaled-double rounding.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 4
QUERY_MOD = 50  # vec_id % 50 == 0 are the query set
TOPK = 5
ANN_TOPK = 3
_MIX = 2654435761  # Knuth multiplicative constant


def _vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def q_sim_topk_brute(spark, sf_dir):
    """Exact cosine top-k: every QUERY_MOD-th vector against the full
    table. Query side is tiny -> broadcast; the scan side stays
    partition-parallel. Output (q_id, neighbor_id, rank, cos_sim)."""
    vecs = _vecs(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos(F.col("qv"), F.col("v")), 3).alias("cos3"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", "neighbor_id", "rank", F.col("cos3").alias("cos_sim"))
    )


ORACLE_SIM_TOPK_BRUTE = f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings
    ),
    queries AS (SELECT vec_id AS q_id, v AS qv FROM vecs WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
        SELECT q.q_id, x.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, x.v) /
                     (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 3) AS cos3
        FROM vecs x, queries q WHERE x.vec_id != q.q_id
    ),
    ranked AS (
        SELECT q_id, neighbor_id, cos3,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos3 DESC, neighbor_id ASC) AS INTEGER) AS rank
        FROM scored
    )
    SELECT q_id, neighbor_id, rank, cos3 AS cos_sim
    FROM ranked WHERE rank <= {TOPK}
"""


def _planes(spark):
    """N_PLANES deterministic hyperplanes as array<double> columns."""
    return spark.range(N_PLANES).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (((F.lit(1) + (F.col("id") * DIM + d) * _MIX) % 97) - 48).cast("double"),
        ).alias("h"),
    )


def q_sim_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k: sign(dot(v, h_p)) bits -> bucket;
    candidates share the query's bucket. Output (q_id, neighbor_id, rank,
    cos_sim) — approximate by construction; the oracle reproduces the
    same buckets so results match exactly."""
    vecs = _vecs(spark, sf_dir)
    planes = F.broadcast(_planes(spark))
    buckets = (
        vecs.crossJoin(planes)
        .select(
            "vec_id",
            "v",
            F.when(_dot(F.col("v"), F.col("h")) > 0, F.expr("shiftleft(1, p)")).otherwise(0).alias("bit"),
        )
        .groupBy("vec_id")
        .agg(F.first("v").alias("v"), F.sum("bit").cast("int").alias("bucket"))
    )
    queries = buckets.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        buckets.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos(F.col("qv"), F.col("v")), 3).alias("cos3"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ANN_TOPK)
        .select("q_id", "neighbor_id", "rank", F.col("cos3").alias("cos_sim"))
    )


ORACLE_SIM_ANN_LSH = f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings
    ),
    planes AS (
        SELECT CAST(p AS INTEGER) AS p,
               list_transform(range({DIM}), d -> CAST(((1 + (p*{DIM}+d) * {_MIX}) % 97) - 48 AS DOUBLE)) AS h
        FROM (SELECT unnest(range({N_PLANES})) AS p)
    ),
    buckets AS (
        SELECT vec_id, any_value(v) AS v,
               CAST(sum(CASE WHEN list_dot_product(v, h) > 0 THEN 1 << p ELSE 0 END) AS INTEGER) AS bucket
        FROM vecs, planes GROUP BY vec_id
    ),
    queries AS (SELECT vec_id AS q_id, v AS qv, bucket FROM buckets WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
        SELECT q.q_id, x.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, x.v) /
                     (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 3) AS cos3
        FROM buckets x JOIN queries q ON x.bucket = q.bucket AND x.vec_id != q.q_id
    ),
    ranked AS (
        SELECT q_id, neighbor_id, cos3,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos3 DESC, neighbor_id ASC) AS INTEGER) AS rank
        FROM scored
    )
    SELECT q_id, neighbor_id, rank, cos3 AS cos_sim
    FROM ranked WHERE rank <= {ANN_TOPK}
"""


QUERIES = {
    "sim_topk_brute": q_sim_topk_brute,
    "sim_ann_lsh": q_sim_ann_lsh,
}
ORACLES = {
    "sim_topk_brute": ORACLE_SIM_TOPK_BRUTE,
    "sim_ann_lsh": ORACLE_SIM_ANN_LSH,
}
