"""REAL GIF pixel decode: LZW round-trips (including the KwKwK corner),
formula-replay pins on synthesized payloads, and quarantine of poisoned
rows.  Mirrors tests/test_png_pixels.py — the stats must come from the
FORMULA, never from running the decoder twice."""

from __future__ import annotations

import struct

import numpy as np
import pytest as _pytest_mark_mod

pytestmark = _pytest_mark_mod.mark.slow

from logspout_kinesis_tests_spark.operators.multimodal import (
    _gif_decode_rgb,
    _gif_lzw_decode,
    _gif_lzw_encode,
)

W, H = 24, 18


def _palette() -> np.ndarray:
    return np.array(
        [
            ((i * 17) % 256, (i * 29 + 3) % 256, (i * 53 + 7) % 256)
            for i in range(16)
        ],
        dtype=np.int64,
    )


def _formula_pixels(d: int) -> np.ndarray:
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    idx = (d * 7 + y * 5 + x * 3) % 16
    return _palette()[idx]  # (H, W, 3)


def test_lzw_roundtrip_formula_and_kwkwk():
    # formula indices
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    idx = ((3 * 7 + y * 5 + x * 3) % 16).astype(np.uint8).tobytes()
    assert _gif_lzw_decode(_gif_lzw_encode(idx, 4), 4, len(idx)) == idx
    # the KwKwK corner: a run of one symbol forces code == len(table)
    run = bytes([0] * 50)
    assert _gif_lzw_decode(_gif_lzw_encode(run, 2), 2, 50) == run
    # growth across several code widths: 200 distinct-ish pairs
    mixed = bytes((i * 7 + (i >> 3)) % 16 for i in range(4000))
    assert _gif_lzw_decode(_gif_lzw_encode(mixed, 4), 4, 4000) == mixed


def test_decode_matches_formula_direct():
    """Pure-Python: decode one synthesized payload and compare EVERY pixel
    against the formula (not just the aggregates)."""
    from logspout_kinesis_tests_spark.operators.multimodal import (
        synth_gif_pixel_payload,  # noqa: F401  (import proves it exists)
    )

    # rebuild the fixture bytes by hand so the test does not depend on a
    # Spark session: same structure synth_gif_pixel_payload writes
    d = 5
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    idx = ((d * 7 + y * 5 + x * 3) % 16).astype(np.uint8).tobytes()
    lzw = _gif_lzw_encode(idx, 4)
    sub = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    palette = bytes(
        v
        for i in range(16)
        for v in ((i * 17) % 256, (i * 29 + 3) % 256, (i * 53 + 7) % 256)
    )
    raw = (
        b"GIF89a"
        + struct.pack("<HHBBB", W, H, 0x80 | 0x03, 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, W, H, 0)
        + bytes([4])
        + sub
        + b"\x00\x3b"
    )
    px = _gif_decode_rgb(raw)
    assert px is not None and px.shape == (H, W, 3)
    assert (px.astype(np.int64) == _formula_pixels(d)).all()
    # extensions before the image descriptor must be skipped cleanly
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = raw[: 13 + 48] + gce + raw[13 + 48 :]
    px2 = _gif_decode_rgb(with_ext)
    assert px2 is not None and (px2 == px).all()


def test_poisoned_payloads_quarantined():
    good_header = b"GIF89a" + struct.pack("<HHBBB", W, H, 0x80 | 0x03, 0, 0)
    cases = {
        "bad_signature": b"JIF89a" + b"\x00" * 40,
        "truncated_lsd": b"GIF89a\x01\x00",
        "no_color_table_no_image": good_header[:6]
        + struct.pack("<HHBBB", W, H, 0x00, 0, 0)
        + b"\x3b",
        "oversized": b"GIF89a"
        + struct.pack("<HHBBB", 60000, 60000, 0x80 | 0x03, 0, 0)
        + bytes(48)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 60000, 60000, 0)
        + bytes([4, 1, 0x00, 0x00])
        + b"\x3b",
        "interlaced": good_header
        + bytes(48)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, W, H, 0x40)
        + bytes([4, 1, 0x00, 0x00])
        + b"\x3b",
        "corrupt_lzw": good_header
        + bytes(48)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, W, H, 0)
        + bytes([4, 2, 0xFF, 0xFF, 0x00])
        + b"\x3b",
        # spec max LZW min-code-size is 8; 9-11 once crashed the literal
        # table build instead of quarantining
        "oversize_code_size": good_header
        + bytes(48)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, W, H, 0)
        + bytes([9, 2, 0xFF, 0xFF, 0x00])
        + b"\x3b",
    }
    for name, raw in cases.items():
        assert _gif_decode_rgb(raw) is None, name


def test_gif_pixel_stats_matches_formula(spark):
    """Spark side: synth → decode → stats equals the formula-computed
    aggregates for every (doc, channel); poisoned rows vanish."""
    import pyspark.sql.functions as F

    from logspout_kinesis_tests_spark.operators.multimodal import (
        gif_pixel_stats,
        synth_gif_pixel_payload,
    )

    docs = spark.createDataFrame([(d,) for d in range(6)], "doc_id long")
    payloads = synth_gif_pixel_payload(docs, width=W, height=H)
    poison = spark.createDataFrame(
        [
            (100, bytearray(b"JIF89a junk")),
            (101, bytearray(b"GIF89a\x01")),
            (102, None),  # NULL payload must skip, not TypeError the task
        ],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_id"], r["channel"]): (
            r["n_pixels"], r["sum_val"], r["min_val"], r["max_val"],
        )
        for r in gif_pixel_stats(payloads.unionByName(poison)).collect()
    }
    assert {k[0] for k in got} == set(range(6))  # poison rows skipped
    for d in range(6):
        px = _formula_pixels(d)
        for ch in range(3):
            plane = px[:, :, ch]
            assert got[(d, ch)] == (
                W * H, int(plane.sum()), int(plane.min()), int(plane.max()),
            )
