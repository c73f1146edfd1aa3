"""Similarity search over the embeddings table.

Brute-force cosine top-k as the correctness baseline, and a multi-band
random-hyperplane LSH variant as the scale path (at 100 TB the bucket
assignment is one narrow map, the candidate join shuffles once on the
(band, key) pair, and per-bucket top-k is a bounded window — no all-pairs
stage).

The LSH uses an OR-construction over ANN_BANDS bands of
ANN_PLANES_PER_BAND hyperplanes each (16 planes total): a candidate must
match the query's full bit-key in AT LEAST ONE band. Per-band keys of b
bits keep candidate sets ~n/2^b per band (selectivity grows with planes),
while the OR over bands recovers recall that a single monolithic bucket
table loses — P(candidate) = 1 - (1 - p_band)^bands where
p_band = (1 - theta/pi)^b for vectors at angle theta. With 4x4 this is
~0.95 for cos≈0.9 neighbors and ~1-1e-7 for near-duplicates.

Both variants are pure DataFrame code (zip_with/aggregate dot products
inside whole-stage codegen) and exactly reproducible in DuckDB, including
the deterministic pseudo-random hyperplanes: h_p[d] = ((1 + (p*64+d) *
2654435761) % 97) - 48 — integer arithmetic, identical in both engines.

Ranking is done on round(cos, 3) with vec_id tiebreak: coarse rounding
makes score ties abundant and the id tiebreak resolves them, so 1-ulp
float-summation differences between engines can essentially never flip a
rank. The emitted score IS cos3 — never re-round an already-rounded value
across engines: exact .xx5 decimals round differently under Spark's
shortest-string BigDecimal HALF_UP vs DuckDB's scaled-double rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
QUERY_MOD = 50  # vec_id % 50 == 0 are the query set
TOPK = 5
ANN_TOPK = 3
ANN_BANDS = 8
ANN_PLANES_PER_BAND = 3  # 24 planes total, 8 buckets per band.
# Chosen empirically on the synthetic table (near-uniform random vectors —
# the LSH worst case, where true top-k neighbors sit at ~75 degrees):
# 4x4 -> recall@3 0.47, 8x3 -> 0.67, 8x2 -> 0.87 but ~2n candidates.
# Real embedding corpora cluster, so the same 8x3 yields both higher
# recall and far better selectivity; ppb is the scale knob (buckets per
# band = 2^ppb, candidate share ~ n/2^ppb per band).
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
    # spread the scan side: the per-pair dot products dominate, and a
    # small benchmark table is a single row-group (one task) otherwise
    scored = (
        vecs.repartition(F.col("vec_id")).crossJoin(F.broadcast(queries))
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


def _planes(spark, n_planes: int) -> DataFrame:
    """n_planes deterministic integer-valued hyperplanes as array<double>.
    (p*DIM + d) * MIX stays < 2^42 for any realistic plane count —
    int64-safe in both engines."""
    return spark.range(n_planes).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (((F.lit(1) + (F.col("id") * DIM + d) * _MIX) % 97) - 48).cast("double"),
        ).alias("h"),
    )


def planes_sql(n_planes: int) -> str:
    """DuckDB CTE body reproducing _planes(n_planes) bit-exactly."""
    return f"""
        SELECT CAST(p AS INTEGER) AS p,
               list_transform(range({DIM}), d -> CAST(((1 + (p*{DIM}+d) * {_MIX}) % 97) - 48 AS DOUBLE)) AS h
        FROM (SELECT unnest(range({n_planes})) AS p)
    """


def banded_buckets(spark, vecs: DataFrame, bands: int, ppb: int) -> DataFrame:
    """(vec_id, v, band, key): per-band sign-bit LSH key over
    bands*ppb deterministic hyperplanes. One broadcast of the tiny plane
    table, one narrow map, one groupBy(vec_id, band) — the whole bucket
    assignment is a single shuffle regardless of corpus size. Scaling a
    vector by a positive constant never flips a sign bit, so exact-scaled
    near-duplicates always share every band key.

    The plane dot products are the CPU-dominant stage, so spread the
    vectors across all cores first: a small benchmark table arrives as a
    single parquet row-group (one task) and would serialize them; at
    production scale the scan is already parallel and AQE coalesces."""
    vecs = vecs.repartition(F.col("vec_id"))
    planes = F.broadcast(_planes(spark, bands * ppb))
    return (
        vecs.crossJoin(planes)
        .select(
            "vec_id",
            "v",
            (F.col("p") / ppb).cast("int").alias("band"),
            F.when(
                _dot(F.col("v"), F.col("h")) > 0,
                F.expr(f"shiftleft(1, p % {ppb})"),
            )
            .otherwise(0)
            .alias("bit"),
        )
        .groupBy("vec_id", "band")
        .agg(F.first("v").alias("v"), F.sum("bit").cast("int").alias("key"))
    )


def banded_buckets_sql(bands: int, ppb: int) -> str:
    """DuckDB CTE body reproducing banded_buckets over a `vecs` CTE
    with (vec_id, v)."""
    return f"""
        SELECT vec_id, any_value(v) AS v, CAST(p // {ppb} AS INTEGER) AS band,
               CAST(sum(CASE WHEN list_dot_product(v, h) > 0 THEN 1 << (p % {ppb}) ELSE 0 END) AS INTEGER) AS key
        FROM vecs, planes GROUP BY vec_id, p // {ppb}
    """


def q_sim_ann_lsh(spark, sf_dir):
    """Multi-band LSH approximate top-k: candidates share the query's
    full bit-key in >=1 of ANN_BANDS bands (OR-construction). Output
    (q_id, neighbor_id, rank, cos_sim) — approximate by construction; the
    oracle reproduces the same buckets so results match exactly."""
    vecs = _vecs(spark, sf_dir)
    banded = banded_buckets(spark, vecs, ANN_BANDS, ANN_PLANES_PER_BAND)
    queries = banded.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "band", "key"
    )
    scored = (
        banded.join(F.broadcast(queries), ["band", "key"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos(F.col("qv"), F.col("v")), 3).alias("cos3"),
        )
        .distinct()  # a pair may collide in several bands; cos3 is a pure
        # function of the pair, so distinct on (q_id, neighbor, cos3) is
        # exactly pair-dedup
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
    planes AS ({planes_sql(ANN_BANDS * ANN_PLANES_PER_BAND)}),
    banded AS ({banded_buckets_sql(ANN_BANDS, ANN_PLANES_PER_BAND)}),
    queries AS (SELECT vec_id AS q_id, v AS qv, band, key FROM banded WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
        SELECT DISTINCT q.q_id, x.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, x.v) /
                     (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 3) AS cos3
        FROM banded x JOIN queries q ON x.band = q.band AND x.key = q.key AND x.vec_id != q.q_id
    ),
    ranked AS (
        SELECT q_id, neighbor_id, cos3,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos3 DESC, neighbor_id ASC) AS INTEGER) AS rank
        FROM scored
    )
    SELECT q_id, neighbor_id, rank, cos3 AS cos_sim
    FROM ranked WHERE rank <= {ANN_TOPK}
"""


IVF_CENTROID_MOD = 37  # vectors with vec_id % 37 == 1 are the centroids
# (~n/37 cells — the deterministic stand-in for a k-means codebook; at
# scale the codebook is a trained side table, same plan shape)
IVF_NPROBE = 4  # query searches its top-4 cells — the standard IVF
# recall knob (single-probe on near-uniform vectors recalls ~0.07;
# nprobe=4 ≈ 0.3 at ~30% scan share; clustered real data needs fewer)


def q_sim_ann_ivf(spark, sf_dir):
    """IVF-flat approximate top-k: assign every vector to its
    nearest-centroid cell (argmax cosine over a BROADCAST codebook — one
    narrow pass), then search the query's IVF_NPROBE closest cells (one
    shuffle on cell id). The second ANN strategy next to the hyperplane
    LSH: IVF gives data-adaptive cells where LSH gives data-oblivious
    ones. Output (q_id, neighbor_id, rank, cos_sim); oracle reproduces
    the cells exactly, so results match bit-for-bit."""
    vecs = _vecs(spark, sf_dir).repartition(F.col("vec_id"))
    cent = vecs.filter(F.col("vec_id") % IVF_CENTROID_MOD == 1).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    assign = vecs.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "v",
        "c_id",
        F.round(_cos(F.col("v"), F.col("cv")), 6).alias("csim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("c_id").asc())
    ranked_cells = assign.withColumn("rn", F.row_number().over(wa))
    cells = ranked_cells.filter(F.col("rn") == 1).select(
        "vec_id", "v", F.col("c_id").alias("cell")
    )
    queries = (
        ranked_cells.filter(
            (F.col("vec_id") % QUERY_MOD == 0) & (F.col("rn") <= IVF_NPROBE)
        )
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("c_id").alias("cell"))
    )
    scored = (
        cells.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cos(F.col("qv"), F.col("v")), 3).alias("cos3"),
        )
        .distinct()  # a neighbor sits in ONE cell, but keep the pair-dedup
        # explicit for the nprobe>cell-count edge
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ANN_TOPK)
        .select("q_id", "neighbor_id", "rank", F.col("cos3").alias("cos_sim"))
    )


ORACLE_SIM_ANN_IVF = f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings
    ),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id % {IVF_CENTROID_MOD} = 1),
    assign AS (
        SELECT x.vec_id, x.v, c.c_id,
               round(list_dot_product(x.v, c.cv) /
                     (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) AS csim
        FROM vecs x, cent c
    ),
    ranked_cells AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id ASC) AS rn
        FROM assign
    ),
    cells AS (SELECT vec_id, v, c_id AS cell FROM ranked_cells WHERE rn = 1),
    queries AS (
        SELECT vec_id AS q_id, v AS qv, c_id AS cell FROM ranked_cells
        WHERE vec_id % {QUERY_MOD} = 0 AND rn <= {IVF_NPROBE}
    ),
    scored AS (
        SELECT DISTINCT q.q_id, x.vec_id AS neighbor_id,
               round(list_dot_product(q.qv, x.v) /
                     (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 3) AS cos3
        FROM cells x JOIN queries q ON x.cell = q.cell AND x.vec_id != q.q_id
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
    "sim_ann_ivf": q_sim_ann_ivf,
}
ORACLES = {
    "sim_topk_brute": ORACLE_SIM_TOPK_BRUTE,
    "sim_ann_lsh": ORACLE_SIM_ANN_LSH,
    "sim_ann_ivf": ORACLE_SIM_ANN_IVF,
}
