"""Whole-file mutation fuzz for every real container parser.

The degrade contract each decoder documents is: a malformed container
raises ValueError — never struct.error / KeyError / IndexError /
UnicodeDecodeError / zlib.error or an unbounded loop. The per-codec test
batteries probe targeted corruptions; this file sweeps RANDOM mutations
(byte flips, truncations, insertions, deletions) across the WHOLE file
for all five formats and asserts the only two legal outcomes: a
successful decode (a mutation may land in unchecked content bytes — JPEG
entropy and CSV carry no checksum by design) or ValueError.

Hypothesis drives the mutation positions/values from a deterministic
profile so the sweep is reproducible.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from docling_fast_server_spark.operators.multimodal import (
    _decode_bmp_pixels,
    _decode_gif_pixels,
    _decode_jpeg_pixels,
    _decode_png_pixels,
    _decode_table_cells,
    _encode_bmp,
    _encode_gif,
    _encode_jpeg,
    _encode_png,
    _encode_table_csv,
)

_CODECS = [
    ("bmp", _encode_bmp, _decode_bmp_pixels),
    ("png", _encode_png, _decode_png_pixels),
    ("gif", _encode_gif, _decode_gif_pixels),
    ("jpeg", _encode_jpeg, _decode_jpeg_pixels),
    ("csv", _encode_table_csv, _decode_table_cells),
]


def _apply_mutations(blob: bytes, ops: list[tuple[int, int, int]]) -> bytes:
    """ops: (kind, position-seed, value). kind 0 = flip byte, 1 =
    truncate at position, 2 = insert byte, 3 = delete byte."""
    b = bytearray(blob)
    for kind, pos_seed, val in ops:
        if not b:
            break
        pos = pos_seed % len(b)
        if kind == 0:
            b[pos] ^= val or 0xFF
        elif kind == 1:
            del b[pos:]
        elif kind == 2:
            b.insert(pos, val)
        else:
            del b[pos]
    return bytes(b)


@settings(max_examples=120, deadline=None)
@given(
    codec_i=st.integers(0, len(_CODECS) - 1),
    seed=st.integers(0, 500),
    ops=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1 << 16), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    ),
)
def test_mutated_containers_decode_or_valueerror(codec_i, seed, ops):
    name, enc, dec = _CODECS[codec_i]
    blob = _apply_mutations(enc(seed), ops)
    try:
        dec(blob)
    except ValueError:
        pass  # the documented degrade outcome
    # any OTHER exception type propagates and fails the test


@settings(max_examples=60, deadline=None)
@given(
    codec_i=st.integers(0, len(_CODECS) - 1),
    data=st.binary(min_size=0, max_size=400),
)
def test_random_bytes_never_crash_decoders(codec_i, data):
    """Pure garbage (not derived from a valid file) must also be a clean
    ValueError or — vanishingly unlikely — a successful parse (CSV
    accepts most text-like garbage by design)."""
    name, _, dec = _CODECS[codec_i]
    try:
        dec(data)
    except ValueError:
        pass
