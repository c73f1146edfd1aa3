"""Deduplication suite — the training-data-pipeline operators.

The reference dedups work at two levels: client job_id echo
(/root/reference/src/routes/ocr.py:96-103 -> 409) and content-hash
duplicate suppression (queue_manager.py:917-929 find_duplicate_job).
At corpus scale those become the classic dedup family, implemented
relationally so every variant is Catalyst-optimized, shuffle-aware and
exactly reproducible by the DuckDB oracle:

- exact:    hash-groupBy on content, keep min(doc_id) (J1/J2 analog)
- minhash:  shingle -> global shingle dictionary (dense_rank) ->
            k universal hashes (a_j * rank + b_j mod P) -> min per doc ->
            LSH banding -> candidate pairs -> exact-Jaccard verify.
            Pure joins/aggregations: at 100 TB the dictionary becomes a
            broadcast/bucketed dimension and banding is one shuffle on
            (band, key) — no all-pairs stage ever materializes.
- simhash:  idf-weighted sign-sum over mixed universal hashes -> 32-bit
            fingerprint, byte-banded blocking for hamming<=3 pairs.
- ngram-jaccard: exact Jaccard on LSH candidates (the verify stage alone).
- embedding near-dup: cosine over the embeddings table, label-blocked.

The near-dup test corpus is self-made: deterministic mutated copies of
every 10th document (doc_id+100000, three extra tokens) and exact copies
of every 25th (doc_id+200000) — expressible identically in Spark and SQL,
so the oracle can reproduce the whole pipeline end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

P_HASH = 1_000_003
MIX = 2_654_435_761  # multiply before mod: (a*r+b) alone never exceeds
# P for dictionary-sized ranks, so min() would always pick the lowest
# rank (degenerate minhash) and parity would collapse to parity(r)
# (degenerate simhash); the product wraps P thoroughly. All int64-safe.
MINHASH_K = 8
BAND_ROWS = 4  # 2 bands x 4 rows: collision prob per band = s^4, which
# keeps candidate sets small even on overlap-heavy corpora (tiny shared
# vocab inflates per-hash match probability; 2-row bands produced ~56k
# false candidates on 5.7k docs at sf0.1)
HASH_A = [7, 11, 13, 17, 19, 23, 29, 31]
HASH_B = [3, 5, 101, 2003, 407, 99, 12, 77]
SHINGLE = 3
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32
HAMMING_MAX = 3
COSINE_THRESHOLD = 0.999
NEAR_STEP = 100_000  # mutated near-dup copies
EXACT_STEP = 200_000  # exact copies


def _docs(spark, sf_dir) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def mutated_corpus(spark, sf_dir) -> DataFrame:
    """base ∪ near-dup copies (every 10th, +' xtra token end') ∪ exact
    copies (every 25th). Deterministic; mirrored in oracle SQL."""
    base = _docs(spark, sf_dir)
    near = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + NEAR_STEP).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xtra token end")).alias("text"),
        )
    )
    exact = base.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + EXACT_STEP).alias("doc_id"), "text"
    )
    return base.unionByName(near).unionByName(exact)


MUTATED_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {NEAR_STEP}, text || ' xtra token end'
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + {EXACT_STEP}, text FROM documents WHERE doc_id % 25 = 0
"""


# ---------------------------------------------------------------------------
# exact dedup (J1/J2: content-hash duplicate suppression)
# ---------------------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    """Groups with >1 identical text: (keeper_doc_id, n_docs).
    At scale: groupBy(xxhash64(text)) first, verify text within group —
    here text directly since the oracle has no xxhash64."""
    return (
        mutated_corpus(spark, sf_dir)
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .select("keeper_doc_id", "n_docs")
    )


ORACLE_DEDUP_EXACT = f"""
    WITH corpus AS ({MUTATED_SQL})
    SELECT min(doc_id) AS keeper_doc_id, CAST(count(*) AS BIGINT) AS n_docs
    FROM corpus GROUP BY text HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# shingles + universal hashes (shared by minhash / simhash / jaccard)
# ---------------------------------------------------------------------------
def _shingles(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh) distinct word-SHINGLE-grams. Narrow explode."""
    w = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - SHINGLE, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )
    return (
        corpus.filter(F.size(w) >= SHINGLE)
        .select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )


SHINGLES_SQL = f"""
    SELECT DISTINCT doc_id,
           w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)] || ' ' ||
           w[CAST(i+3 AS INTEGER)] AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         unnest(range(4096)) AS u(i)
    WHERE len(w) >= {SHINGLE} AND i <= len(w) - {SHINGLE}
"""


def _ranked_shingles(shingles: DataFrame) -> DataFrame:
    """Attach the global lexicographic rank — the shingle dictionary.

    A naive dense_rank() over an unpartitioned window funnels every
    distinct shingle through ONE partition (WindowExec warns exactly
    this). Scalable two-phase ranking instead: bucket by range-friendly
    prefix, row_number within bucket (parallel windows), then add the
    cumulative count of all earlier buckets (a tiny broadcast). Result is
    identical to global dense_rank on distinct values.

    At 100 TB one would hash shingles (xxhash64) instead of ranking; the
    lexicographic dictionary exists so the DuckDB oracle can reproduce
    signatures bit-exactly. The two-phase shape is the same one used for
    global sorts at scale (range partition + local rank + offsets)."""
    from pyspark.sql import Window

    distinct = shingles.select("sh").distinct()
    bucketed = distinct.withColumn("b", F.substring("sh", 1, 4))
    local = bucketed.withColumn(
        "lr", F.row_number().over(Window.partitionBy("b").orderBy("sh")).cast("long")
    )
    offsets = (
        bucketed.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("b", "off")
    )
    dic = local.join(F.broadcast(offsets), "b").select(
        "sh", (F.col("lr") + F.col("off")).alias("r")
    )
    # the dictionary (distinct shingles) is orders of magnitude smaller
    # than the per-doc shingle table — broadcast it; Catalyst can't infer
    # post-window sizes, so be explicit
    return shingles.join(F.broadcast(dic), "sh")


RANKED_SQL = """
    , dict AS (
        SELECT sh, CAST(dense_rank() OVER (ORDER BY sh) AS BIGINT) AS r
        FROM (SELECT DISTINCT sh FROM shingles)
    ),
    ranked AS (SELECT s.doc_id, s.sh, d.r FROM shingles s JOIN dict d USING (sh))
"""


def _hash_params(spark) -> DataFrame:
    rows = [(j, HASH_A[j], HASH_B[j]) for j in range(MINHASH_K)]
    return spark.createDataFrame(rows, "j int, a long, b long")


HASH_PARAMS_SQL = (
    "(VALUES "
    + ", ".join(f"({j}, {HASH_A[j]}, {HASH_B[j]})" for j in range(MINHASH_K))
    + ") AS hp(j, a, b)"
)


# ---------------------------------------------------------------------------
# MinHash + LSH banding + exact-Jaccard verify
# ---------------------------------------------------------------------------
def q_dedup_minhash(spark, sf_dir):
    """LSH candidate pairs verified by exact Jaccard >= threshold.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    corpus = mutated_corpus(spark, sf_dir)
    # the shingle set feeds four downstream consumers (signatures, sizes,
    # and both sides of the intersection join) — persist once instead of
    # re-exploding the corpus per consumer
    sh = _shingles(corpus).persist()
    ranked = _ranked_shingles(sh)
    hp = F.broadcast(_hash_params(spark))
    sig = (
        ranked.crossJoin(hp)
        .groupBy("doc_id", "j")
        .agg(F.min((F.col("a") * F.col("r") + F.col("b")) * MIX % P_HASH).alias("h"))
    )
    bands = (
        sig.withColumn("band", (F.col("j") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws("-", F.array_sort(F.collect_list(F.concat_ws(":", "j", "h")))).alias("key"))
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # shared-shingle count: join candidate pairs to both shingle sets so
    # the intermediate is |A∩B| rows per pair, never |A|×|B|; join on the
    # int64 dictionary rank, not the shingle string (cheaper hash/shuffle)
    rk = ranked.select("doc_id", "r")
    shared = (
        cand.join(rk.select(F.col("doc_id").alias("doc_a"), "r"), "doc_a")
        .join(rk.select(F.col("doc_id").alias("doc_b"), "r"), ["doc_b", "r"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 4),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


ORACLE_DEDUP_MINHASH = f"""
    WITH corpus AS ({MUTATED_SQL}),
    shingles AS ({SHINGLES_SQL})
    {RANKED_SQL},
    sig AS (
        SELECT doc_id, hp.j, min((hp.a * r + hp.b) * {MIX} % {P_HASH}) AS h
        FROM ranked, {HASH_PARAMS_SQL}
        GROUP BY doc_id, hp.j
    ),
    bands AS (
        SELECT doc_id, j // {BAND_ROWS} AS band,
               array_to_string(list_sort(list(CAST(j AS VARCHAR) || ':' || CAST(h AS VARCHAR))), '-') AS key
        FROM sig GROUP BY doc_id, j // {BAND_ROWS}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
        WHERE x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    shared AS (
        SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
        FROM cand c
        JOIN shingles sa ON sa.doc_id = c.doc_a
        JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT s.doc_a, s.doc_b,
           round(CAST(s.n_shared AS DOUBLE) / (za.n + zb.n - s.n_shared), 4) AS jaccard
    FROM shared s
    JOIN sizes za ON za.doc_id = s.doc_a
    JOIN sizes zb ON zb.doc_id = s.doc_b
    WHERE round(CAST(s.n_shared AS DOUBLE) / (za.n + zb.n - s.n_shared), 4) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# SimHash fingerprints (+ blocked hamming pairs)
# ---------------------------------------------------------------------------
SIMHASH_STREAMS = 4  # 4 bit-streams per hash param -> 32-bit fingerprint
# (16 bits over an overlap-heavy corpus collides massively: 81k hamming<=3
# pairs on 550 docs; 32 bits restores discrimination)


def q_dedup_simhash(spark, sf_dir):
    """32-bit weighted simhash per document: bit (j, k) set iff the
    specificity-weighted sign-sum of shingle-hash parities is positive
    under variant k of hash_j. Weight = 1000 div document-frequency
    (integer idf): common shingles cancel out, document-specific shingles
    dominate — without weighting, a small shared vocabulary concentrates
    every signature into a few hamming-adjacent values (70k+ false
    hamming<=3 pairs on 550 docs). Integer weights keep the sums
    order-independent and bit-exact across engines.
    Output: (doc_id, simhash)."""
    corpus = mutated_corpus(spark, sf_dir)
    sh = _shingles(corpus)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        _ranked_shingles(sh)
        .join(F.broadcast(dfreq), "sh")
        .withColumn("wt", F.expr("1000 div df"))
    )
    hp = F.broadcast(_hash_params(spark))
    base = ranked.crossJoin(hp)
    sums = base.groupBy("doc_id", "j").agg(
        *[
            F.sum(
                (
                    ((((F.col("a") + 2 * k) * F.col("r") + F.col("b") * (2 * k + 1)) * MIX % P_HASH) % 2)
                    * 2
                    - 1
                )
                * F.col("wt")
            ).alias(f"s{k}")
            for k in range(SIMHASH_STREAMS)
        ]
    )
    part = None
    for k in range(SIMHASH_STREAMS):
        term = F.when(
            F.col(f"s{k}") > 0, F.expr(f"shiftleft(CAST(1 AS BIGINT), j + {k * MINHASH_K})")
        ).otherwise(0)
        part = term if part is None else part + term
    return (
        sums.select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.sum("part").cast("long").alias("simhash"))
    )


_SIMHASH_BITS_SQL = ",\n               ".join(
    f"sum(((((hp.a + {2 * k}) * r + hp.b * {2 * k + 1}) * {MIX} % {P_HASH}) % 2 * 2 - 1) * wt) AS s{k}"
    for k in range(SIMHASH_STREAMS)
)
# dfreq/weight CTE appended after RANKED_SQL by the simhash oracles
_WEIGHTED_SQL = """
    , dfreq AS (SELECT sh, count(*) AS df FROM shingles GROUP BY sh),
    weighted AS (
        SELECT ranked.doc_id, ranked.r, 1000 // dfreq.df AS wt
        FROM ranked JOIN dfreq USING (sh)
    )
"""
_SIMHASH_SUM_SQL = "\n              + ".join(
    f"CASE WHEN s{k} > 0 THEN CAST(1 AS BIGINT) << (j + {k * MINHASH_K}) ELSE 0 END"
    for k in range(SIMHASH_STREAMS)
)

ORACLE_DEDUP_SIMHASH = f"""
    WITH corpus AS ({MUTATED_SQL}),
    shingles AS ({SHINGLES_SQL})
    {RANKED_SQL}{_WEIGHTED_SQL},
    bits AS (
        SELECT doc_id, hp.j,
               {_SIMHASH_BITS_SQL}
        FROM weighted, {HASH_PARAMS_SQL}
        GROUP BY doc_id, hp.j
    )
    SELECT doc_id,
           CAST(sum({_SIMHASH_SUM_SQL}) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    """Near-dup pairs: hamming(simhash) <= HAMMING_MAX, blocked on 4
    nibble bands (pigeonhole: <=3 differing bits over 4 bands leaves at
    least one band identical), so no all-pairs join exists at scale."""
    sig = q_dedup_simhash(spark, sf_dir)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * k)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for k in range(4)  # 4 bands x 8 bits of the 32-bit sig
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
        .withColumn("hamming", F.col("hamming").cast("int"))
    )
    return pairs


ORACLE_DEDUP_SIMHASH_PAIRS = f"""
    WITH corpus AS ({MUTATED_SQL}),
    shingles AS ({SHINGLES_SQL})
    {RANKED_SQL}{_WEIGHTED_SQL},
    bits AS (
        SELECT doc_id, hp.j,
               {_SIMHASH_BITS_SQL}
        FROM weighted, {HASH_PARAMS_SQL}
        GROUP BY doc_id, hp.j
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum({_SIMHASH_SUM_SQL}) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
    FROM sig x JOIN sig y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= {HAMMING_MAX}
      AND (x.simhash % 256 = y.simhash % 256
           OR (x.simhash // 256) % 256 = (y.simhash // 256) % 256
           OR (x.simhash // 65536) % 256 = (y.simhash // 65536) % 256
           OR (x.simhash // 16777216) % 256 = (y.simhash // 16777216) % 256)
"""


# ---------------------------------------------------------------------------
# embedding near-dup (cosine, label-blocked)
# ---------------------------------------------------------------------------
def q_dedup_embedding(spark, sf_dir):
    """Near-identical embedding pairs (cosine >= threshold) within label
    blocks. Mutated corpus: every 10th vector duplicated scaled by 1.01
    (cosine exactly 1). Output: (vec_a, vec_b, cos_sim)."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    near = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + NEAR_STEP).alias("vec_id"),
        "label",
        F.transform("v", lambda x: x * 1.01).alias("v"),
    )
    allv = base.unionByName(near)
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    x, y = allv.alias("x"), allv.alias("y")
    pairs = (
        x.join(y, "label")  # label blocking: the scale path shuffles once on label
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            (
                dot(F.col("x.v"), F.col("y.v"))
                / (F.sqrt(dot(F.col("x.v"), F.col("x.v"))) * F.sqrt(dot(F.col("y.v"), F.col("y.v"))))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos_sim"))
    )
    return pairs


ORACLE_DEDUP_EMBEDDING = f"""
    WITH base AS (
        SELECT vec_id, label, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings
    ),
    allv AS (
        SELECT * FROM base
        UNION ALL
        SELECT vec_id + {NEAR_STEP}, label, list_transform(v, e -> e * 1.01)
        FROM base WHERE vec_id % 10 = 0
    ),
    pairs AS (
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
               list_dot_product(x.v, y.v) /
               (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cos
        FROM allv x JOIN allv y ON x.label = y.label AND x.vec_id < y.vec_id
    )
    SELECT vec_a, vec_b, round(cos, 4) AS cos_sim
    FROM pairs WHERE cos >= {COSINE_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_embedding": q_dedup_embedding,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash": ORACLE_DEDUP_MINHASH,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
    "dedup_simhash_pairs": ORACLE_DEDUP_SIMHASH_PAIRS,
    "dedup_embedding": ORACLE_DEDUP_EMBEDDING,
}
