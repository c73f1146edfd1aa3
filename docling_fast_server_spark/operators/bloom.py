"""Bloom-pruned resume anti-join — shuffle-free skip of committed docs.

The resume operator (lineage.anti_join_committed — the content-hash
duplicate suppression of the reference's find_duplicate_job,
/root/reference/src/services/queue_manager.py:917-929) is a plain
``left_anti`` join on doc_id.  Semantically right, but at 10^12 docs the
anti-join hash-partitions BOTH sides — the raw corpus pays a full shuffle
just to discover that most of it is new.

This module splits the resume into two routes with a Bloom filter that
lives entirely inside Catalyst — no driver-side bitset, no UDF:

  build:  committed keys -> k xxhash64 positions -> 64-bit blocks via a
          map-side-combinable ``groupBy(block).agg(bit_or(bit))`` — at most
          m/64 rows of two longs, broadcastable (a 10^8-key filter at 1%
          fpp is ~240 MB of blocks; shard the key space and loop at larger
          committed counts).
  probe:  k BroadcastHashJoin lookups against the block table (map-side,
          zero shuffle of the raw corpus; the k probes broadcast the same
          aggregate, which exchange reuse collapses to one broadcast).
  route:  any probe missing  -> DEFINITELY uncommitted: emitted directly,
          never shuffled.
          all probes hit     -> possibly committed (|committed| + fpp·|raw|
          rows): exact ``left_anti`` on just this slice.

Result is ALWAYS exactly equal to the plain anti-join — Bloom filters have
no false negatives, and false positives only route rows into the exact
join.  The raw side's shuffle volume drops from |raw| to roughly
|committed|; the build itself shuffles only k·|committed| positions into a
partial-aggregated block table.

Sizing uses the standard Bloom formulas (m = -n·ln p / ln²2,
k = (m/n)·ln 2); ``expected`` defaults to the committed row count, which a
production Iceberg table serves from snapshot metadata without a scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# Cap the probe chain: fpp <= 1% wants ~7 hashes; beyond 8 the extra joins
# cost more than the marginal fpp is worth on the routed slice.
MAX_HASHES = 8


def bloom_params(expected: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for an expected key count and target fpp.
    num_bits is rounded up to a multiple of 64 (whole blocks)."""
    n = max(1, int(expected))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, min(MAX_HASHES, round((m / n) * math.log(2))))
    return m, k


def _pos_sql(i: int, key: str, m: int) -> str:
    """Position of hash i in [0, m): xxhash64 seeded by prefixing the hash
    index as an extra hashed column; pmod BEFORE any arithmetic so nothing
    overflows under ANSI."""
    return f"pmod(xxhash64({i}, `{key}`), CAST({m} AS BIGINT))"


def _block_sql(pos: str) -> str:
    return f"(({pos}) div 64)"


def _bit_sql(pos: str) -> str:
    return f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({pos}, 64) AS INT))"


def bloom_blocks(
    committed: DataFrame, key: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """The filter itself as data: (block bigint, word bigint), one row per
    64-bit block with at least one set bit.  bit_or is map-side
    combinable, so the build is one partial-aggregated shuffle of
    k·|committed| (block, bit) pairs — never of the committed payload."""
    pos_exprs = [
        F.expr(_pos_sql(i, key, num_bits)) for i in range(num_hashes)
    ]
    return (
        committed.select(F.explode(F.array(*pos_exprs)).alias("pos"))
        .select(
            F.expr(_block_sql("pos")).alias("block"),
            F.expr(_bit_sql("pos")).alias("bit"),
        )
        .groupBy("block")
        .agg(F.bit_or("bit").alias("word"))
    )


def _probe(
    raw: DataFrame, blocks: DataFrame, key: str, num_bits: int, num_hashes: int
) -> tuple[DataFrame, list[str]]:
    """Attach __bloom_hit{i} columns via k broadcast lookups of the block
    table.  Left joins: a missing block means the bit is unset."""
    cur = raw
    hit_cols = []
    for i in range(num_hashes):
        pos = _pos_sql(i, key, num_bits)
        b = blocks.select(
            F.col("block").alias(f"__blk{i}"), F.col("word").alias(f"__wrd{i}")
        )
        cur = cur.join(
            F.broadcast(b),
            F.expr(_block_sql(pos)) == F.col(f"__blk{i}"),
            "left",
        )
        hit = f"__bloom_hit{i}"
        cur = cur.withColumn(
            hit,
            F.coalesce(
                F.expr(_bit_sql(pos)).bitwiseAND(F.col(f"__wrd{i}")) != 0,
                F.lit(False),
            ),
        ).drop(f"__blk{i}", f"__wrd{i}")
        hit_cols.append(hit)
    return cur, hit_cols


def bloom_prune_anti_join(
    raw: DataFrame,
    committed: DataFrame,
    key: str = "doc_id",
    expected: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """``raw LEFT ANTI JOIN committed ON key`` with the raw side's shuffle
    pruned by a Bloom pre-filter.  Bit-exact equal to the plain anti-join
    for every input (property-tested in tests/test_bloom.py).

    ``expected`` sizes the filter; when omitted it is taken from
    ``committed.count()`` (a metadata read on parquet/Iceberg — production
    Iceberg snapshots carry the row count for free)."""
    if expected is None:
        expected = committed.count()
    if expected <= 0:
        # nothing committed -> everything is new; no probes, no joins
        return raw
    num_bits, num_hashes = bloom_params(expected, fpp)
    blocks = bloom_blocks(committed, key, num_bits, num_hashes)
    probed, hit_cols = _probe(raw, blocks, key, num_bits, num_hashes)
    all_hit = F.lit(True)
    for h in hit_cols:
        all_hit = all_hit & F.col(h)
    definite_new = probed.filter(~all_hit).drop(*hit_cols)
    maybe = probed.filter(all_hit).drop(*hit_cols)
    exact = maybe.join(committed.select(key).distinct(), key, "left_anti")
    return definite_new.unionByName(exact)


def bloom_route_counts(
    raw: DataFrame,
    committed: DataFrame,
    key: str = "doc_id",
    expected: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Routing diagnostics as a 1-row frame: how many raw rows bypassed the
    shuffle (n_definite_new) vs. were routed to the exact anti-join
    (n_maybe_committed).  n_maybe far above |committed| means the filter
    was under-sized — the same surface-the-suppression discipline as
    dedup.bucket_tripwire."""
    if expected is None:
        expected = committed.count()
    if expected <= 0:
        return raw.agg(
            F.count(F.lit(1)).alias("n_definite_new"),
            F.lit(0).cast("long").alias("n_maybe_committed"),
        )
    num_bits, num_hashes = bloom_params(expected, fpp)
    blocks = bloom_blocks(committed, key, num_bits, num_hashes)
    probed, hit_cols = _probe(raw, blocks, key, num_bits, num_hashes)
    all_hit = F.lit(True)
    for h in hit_cols:
        all_hit = all_hit & F.col(h)
    return probed.agg(
        F.sum((~all_hit).cast("long")).alias("n_definite_new"),
        F.sum(all_hit.cast("long")).alias("n_maybe_committed"),
    )
