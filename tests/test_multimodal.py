"""Multimodal plumbing: media table synthesis + stubbed decode features."""

from docling_fast_server_spark.operators.multimodal import (
    extract_media_features,
    q_media_features,
    q_media_inventory,
    synthesize_media_table,
)


def test_media_table_shape(spark, sf_dir):
    from docling_fast_server_spark.queries import extract_all

    media = synthesize_media_table(spark, extract_all(spark, sf_dir))
    rows = media.limit(10).collect()
    assert rows
    for r in rows:
        assert r["media_ref"].startswith("media://")
        assert r["media_kind"] in ("image", "table")
        assert len(r["payload"]) == r["n_bytes"]


def test_media_features_deterministic(spark, sf_dir):
    from docling_fast_server_spark.queries import extract_all

    media = synthesize_media_table(spark, extract_all(spark, sf_dir)).limit(20)
    a = {r["media_ref"]: (r["width"], r["height"], r["checksum"])
         for r in extract_media_features(media).collect()}
    b = {r["media_ref"]: (r["width"], r["height"], r["checksum"])
         for r in extract_media_features(media).collect()}
    assert a == b and a


def test_media_inventory_counts(spark, sf_dir):
    inv = {r["media_kind"]: r["n_media"] for r in q_media_inventory(spark, sf_dir).collect()}
    assert inv.get("image", 0) > 0 and inv.get("table", 0) > 0


def test_decoder_injection_seam(spark, sf_dir):
    """The production swap-in seam: injecting a different batch decoder
    must flow through to the features with NO Spark-side change — this
    is exactly how a PIL/libvips decoder replaces the FAKE_DECODE stub."""
    import pandas as pd

    from docling_fast_server_spark.queries import extract_all

    def fixed_decoder(payloads):
        n = len(payloads)
        return pd.DataFrame(
            {"width": [320] * n, "height": [200] * n, "checksum": [7] * n}
        )

    media = synthesize_media_table(spark, extract_all(spark, sf_dir)).limit(5)
    rows = extract_media_features(media, decoder=fixed_decoder).collect()
    assert rows
    assert all(r["width"] == 320 and r["height"] == 200 and r["checksum"] == 7 for r in rows)

    from docling_fast_server_spark.operators.multimodal import transform_media

    t = transform_media(media, decoder=fixed_decoder).collect()
    # 320x200 under a 128 bounded-box resize -> 128x80
    assert all(r["new_width"] == 128 and r["new_height"] == 80 for r in t)
