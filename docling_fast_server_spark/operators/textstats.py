"""Text analysis — language-ID, quality scoring, token counting,
document fingerprinting.

The training-data-pipeline companions to extraction: all pure JVM-side
expressions (split/filter/aggregate higher-order functions — no Python),
each exactly reproducible in the DuckDB oracle.

- token count: whitespace tokenization (the reference counts characters
  per file, queue_manager.py:381-388; token count is the corpus-scale
  version of that metric).
- quality: stopword ratio + length saturation — the jusText-style density
  scoring used for boilerplate in html_extract, applied corpus-wide.
- lang-id: stopword-profile heuristic (en profile; the reference pins
  OCR lang=['en'], pdf_processor.py:105).
- fingerprint: position-weighted polynomial rolling hash over per-word
  byte hashes — deterministic across engines (no engine-specific hash
  functions), the binary_hash analog (output.json:1 .origin.binary_hash).
  Round 1 ranked words through a global dense_rank dictionary (a single-
  partition window funnel); now the word hash is dedup.poly_hash — a
  narrow per-row map, so the whole fingerprint is ONE projection with no
  explode, no join, no window and no shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .dedup import poly_hash, poly_hash_sql

STOPWORDS = ("the", "a", "of", "and", "to", "in")
EN_THRESHOLD = 0.02
FP_PRIME = 1_000_003
FP_MOD = 2_147_483_647  # 2^31 - 1; (h+1)*(pos+1) < 2^61 and
# (x % FP_MOD) * FP_PRIME < 2^51 — int64-safe for ANY document length


def _docs(spark, sf_dir):
    from ..tables import read_table

    return read_table(spark, sf_dir, "documents")


# BPE-ish subword proxy: alnum runs + each punctuation mark its own token
# (the pre-tokenization split every BPE vocabulary starts from). Same RE
# semantics in Java regex and DuckDB RE2 for this character-class-only
# pattern — verified 17 == 17 on a mixed punctuation probe.
BPE_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def q_textstats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish), quality scoring, and
    language-ID in ONE narrow per-doc projection — the three metrics
    share the tokenization anyway, and a single registry row keeps the
    whole query surface inside the driver gate's 50-entry check budget
    (round 2 registered 52 entries; the two past position 50 were the
    only operators without a hard correctness signal). Every column of
    the former ts_token_count / ts_quality / ts_langid rows is still
    value-hash-checked here."""
    w = F.split(F.col("text"), " ")
    stop_in = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    n = F.size(w)
    stop_ratio = stop_in / n
    mean_wlen = (F.length("text") - n + 1) / n
    score = F.round(stop_ratio * 0.5 + F.least(n / 100.0, F.lit(1.0)) * 0.5, 4)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        score.alias("quality_score"),
        F.when(stop_ratio > EN_THRESHOLD, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
        F.round(stop_ratio, 4).alias("en_score"),
    )


_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"

ORACLE_TEXTSTATS = f"""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    r AS (
      SELECT *, CAST(len(list_filter(w, x -> x IN {_STOP_SQL})) AS DOUBLE) / n AS sr
      FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_tokens_bpe,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           round(sr, 4) AS stopword_ratio,
           round(CAST(length(text) - n + 1 AS DOUBLE) / n, 4) AS mean_word_len,
           round(sr * 0.5 + least(n / 100.0, 1.0) * 0.5, 4) AS quality_score,
           CASE WHEN sr > {EN_THRESHOLD} THEN 'en' ELSE 'unk' END AS lang_pred,
           round(sr, 4) AS en_score
    FROM r
"""


def q_fingerprint(spark, sf_dir):
    """Position-weighted polynomial rolling hash:
    fp = sum_i ((poly_hash(word_i)+1) * (i+1) % FP_MOD * FP_PRIME % FP_MOD)
         mod FP_MOD
    — pure integer higher-order functions (transform-with-index +
    aggregate), so the whole fingerprint is a single narrow projection:
    no explode, no dictionary join, no window, zero shuffles. The oracle
    reproduces it bit-exactly via list_zip/unnest (cap-free: valid for
    any document length, no silent truncation)."""
    w = F.split(F.col("text"), " ")
    terms = F.transform(
        w,
        lambda word, i: (
            ((poly_hash(word) + 1) * (i.cast("long") + 1)) % FP_MOD
        )
        * FP_PRIME
        % FP_MOD,
    )
    fp = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % FP_MOD
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        fp.alias("fingerprint"),
        F.size(w).cast("long").alias("n_tokens"),
    )


# sum-then-mod in SQL == running-mod in Spark: every term is already
# < FP_MOD and DuckDB sums in 128-bit, so both equal (sum terms) mod M.
ORACLE_FINGERPRINT = f"""
    WITH words AS (
      SELECT doc_id, CAST(z[2] AS BIGINT) AS pos, CAST(z[1] AS VARCHAR) AS word
      FROM (
        SELECT doc_id, unnest(list_zip(w, range(len(w)))) AS z
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
    )
    SELECT doc_id,
           CAST(sum((({poly_hash_sql('word')} + 1) * (pos + 1)) % {FP_MOD} * {FP_PRIME} % {FP_MOD}) % {FP_MOD} AS BIGINT) AS fingerprint,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM words
    GROUP BY doc_id
"""


QUERIES = {
    "ts_textstats": q_textstats,
    "ts_fingerprint": q_fingerprint,
}
ORACLES = {
    "ts_textstats": ORACLE_TEXTSTATS,
    "ts_fingerprint": ORACLE_FINGERPRINT,
}
