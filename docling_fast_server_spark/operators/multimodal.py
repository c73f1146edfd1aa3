"""Multimodal columns — opaque binary media with typed metadata.

The reference carries media as document items with refs (pictures/tables
pools, /root/reference/output.json:1) and classifies/describes them
(pdf_processor.py:135-141, picture classification + remote captioning).
Here media payloads are opaque BinaryType columns keyed by media_ref, with
decode / feature-extract implemented over mapInPandas so the Spark-side
plumbing (schema, partitioning, Arrow batch shape) is real and tested.

The actual codecs (PIL/ffmpeg-class) are NOT in this container, so the
decode step is a clearly-marked deterministic fake behind
``FAKE_DECODE=True`` — swap ``_decode_image_batch`` for a real decoder in
production; the surrounding Spark code does not change. The remote
captioning analog (K7) stays excluded, as the reference itself runs
without it (pdf_processor.py:144-166 limited pipeline).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

FAKE_DECODE = True  # no image libs in this container — deterministic stub

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), False),  # image|table
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def synthesize_media_table(spark, extracted: DataFrame) -> DataFrame:
    """Build the media side-table from extracted spans: one row per
    media_ref with a deterministic pseudo-payload (bytes derived from the
    ref string — stands in for object-store fetch)."""
    refs = (
        extracted.select(F.explode("spans").alias("s"))
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind in zip(pdf["media_ref"], pdf["kind"]):
                seed = sum(ref.encode())
                n = 256 + (seed * 37) % 1024
                payload = bytes((seed + i * 31) % 256 for i in range(n))
                rows.append(
                    {
                        "media_ref": ref,
                        "media_kind": "image" if kind == "picture" else "table",
                        "payload": payload,
                        "n_bytes": n,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode: real implementation would be PIL.Image.open over each
    payload inside this Arrow batch. The fake derives width/height/checksum
    deterministically from the bytes so tests are stable."""
    if not FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real image decode requires PIL/libvips")
    out = {"width": [], "height": [], "checksum": []}
    for p in payloads:
        b = bytes(p)
        out["width"].append(64 + b[0] % 192)
        out["height"].append(64 + b[-1] % 192)
        out["checksum"].append(sum(b))
    return pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Media table -> per-media features via mapInPandas (Arrow-batched;
    one Python worker init per executor — the warmup pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "width": feats["width"].astype("int32"),
                    "height": feats["height"].astype("int32"),
                    "checksum": feats["checksum"].astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def q_media_inventory(spark, sf_dir):
    """Media inventory over the extracted corpus: counts + bytes per kind.
    Oracle-checkable because payload size is a pure function of media_ref."""
    from ..queries import extract_all

    media = synthesize_media_table(spark, extract_all(spark, sf_dir))
    return media.groupBy("media_kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )


def q_media_features(spark, sf_dir):
    """Exercises the full binary decode path; returns per-media features."""
    from ..queries import extract_all

    media = synthesize_media_table(spark, extract_all(spark, sf_dir))
    return extract_media_features(media).select(
        "media_ref", "media_kind", "width", "height", "checksum"
    )


def _oracle_seeds_cte() -> str:
    from ..oracle import expected_spans_sql

    return f"""
    WITH exp AS ({expected_spans_sql("all")}),
    refs AS (
      SELECT DISTINCT media_ref,
             CASE WHEN kind = 'picture' THEN 'image' ELSE 'table' END AS media_kind
      FROM exp WHERE media_ref IS NOT NULL
    ),
    seeds AS (
      SELECT r.media_ref, r.media_kind, sum(ascii(substring(r.media_ref, CAST(u.i + 1 AS INTEGER), 1))) AS seed
      FROM refs r, unnest(range(64)) AS u(i)
      WHERE u.i < length(r.media_ref)
      GROUP BY r.media_ref, r.media_kind
    ),
    sized AS (
      SELECT media_ref, media_kind, seed,
             256 + (seed * 37) % 1024 AS n
      FROM seeds
    )
"""


def oracle_media_inventory() -> str:
    return (
        _oracle_seeds_cte()
        + """
    SELECT media_kind, CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n) AS BIGINT) AS total_bytes
    FROM sized GROUP BY media_kind
"""
    )


def oracle_media_features() -> str:
    return (
        _oracle_seeds_cte()
        + """
    , bytes AS (
      SELECT s.media_ref, s.media_kind, s.n, s.seed,
             sum((s.seed + u.i * 31) % 256) AS checksum
      FROM sized s, unnest(range(2048)) AS u(i)
      WHERE u.i < s.n
      GROUP BY s.media_ref, s.media_kind, s.n, s.seed
    )
    SELECT media_ref, media_kind,
           CAST(64 + (seed % 256) % 192 AS INTEGER) AS width,
           CAST(64 + ((seed + (n - 1) * 31) % 256) % 192 AS INTEGER) AS height,
           CAST(checksum AS BIGINT) AS checksum
    FROM bytes
"""
    )


QUERIES = {
    "media_inventory": q_media_inventory,
    "media_features": q_media_features,
}


def oracles():
    return {
        "media_inventory": oracle_media_inventory(),
        "media_features": oracle_media_features(),
    }
