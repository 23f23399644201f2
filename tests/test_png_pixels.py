"""REAL PNG pixel decode (operators/multimodal.py png_pixel_stats).

Evidence strategy, same as the r8 audio path: the fixture encoder and the
product decoder share NOTHING but the PNG spec — tests pin decoded stats
against the pixel-generator FORMULA (plain Python/numpy replay), so a bug
that is symmetric in encoder and decoder still can't pass; malformed
payloads must quarantine-by-skip, never mis-decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _formula_pixels(d: int, width: int, height: int) -> np.ndarray:
    y_idx, x_idx, c_idx = np.meshgrid(
        np.arange(height), np.arange(width), np.arange(3), indexing="ij"
    )
    return (d * 7 + y_idx * 31 + x_idx * 13 + c_idx * 5) % 256


def test_png_pixel_stats_match_formula_replay(spark):
    """Decoded per-channel sums/extrema equal the generator formula's —
    non-square dims so stride handling and the row-filter walk (every
    y mod 5 branch) are both on the hook."""
    from logspout_kinesis_tests_spark.operators.multimodal import (
        png_pixel_stats,
        synth_png_pixel_payload,
    )

    width, height, ids = 17, 13, [3, 11, 250]
    docs = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    out = png_pixel_stats(
        synth_png_pixel_payload(docs, width=width, height=height)
    ).collect()
    got = {(r["doc_id"], r["channel"]): r for r in out}
    assert len(got) == len(ids) * 3
    for d in ids:
        px = _formula_pixels(d, width, height)
        for ch in range(3):
            plane = px[:, :, ch]
            r = got[(d, ch)]
            assert r["n_pixels"] == width * height
            assert r["sum_val"] == int(plane.sum())
            assert r["min_val"] == int(plane.min())
            assert r["max_val"] == int(plane.max())


def test_png_decode_bit_exact_pixels():
    """Plain-Python roundtrip: every filter type reproduces the exact
    pixel array, not just its aggregates."""
    from logspout_kinesis_tests_spark.operators.multimodal import _png_decode_rgb

    width, height, d = 16, 10, 42
    px = _formula_pixels(d, width, height)
    stride, bpp = width * 3, 3
    lines = []
    for y in range(height):
        row = px[y].reshape(stride)
        prev = px[y - 1].reshape(stride) if y > 0 else np.zeros(stride, dtype=np.int64)
        ftype = y % 5
        enc = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                pred = [0, a, b, (a + b) // 2][ftype]
            enc[i] = (row[i] - pred) % 256
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    decoded = _png_decode_rgb(payload)
    assert decoded is not None
    pixels, channels = decoded
    assert channels == 3
    assert np.array_equal(pixels, px)


def test_png_decode_quarantines_malformed(spark):
    """One batch mixing a valid payload with five poison shapes — only the
    valid doc may emit rows, and the job must not die (the A19 policy:
    a hostile byte string cannot kill a 100 TB scan)."""
    from logspout_kinesis_tests_spark.operators.multimodal import (
        _png_decode_rgb,
        png_pixel_stats,
        synth_png_pixel_payload,
    )

    good_rows = (
        synth_png_pixel_payload(
            spark.createDataFrame([(1,)], "doc_id long"), width=8, height=8
        )
        .collect()
    )
    good = bytes(good_rows[0]["payload"])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    bad_crc = bytearray(good)
    bad_crc[20] ^= 0x01  # flip an IHDR byte: CRC no longer matches
    oversized = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    palette = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + chunk(b"IEND", b"")
    )
    rows = [
        (1, good),
        (2, bytes(bad_crc)),
        (3, good[: len(good) // 2]),  # truncated mid-chunk
        (4, oversized),
        (5, palette),  # color type 3 (indexed) is out of scope, not garbage
        (6, b"GIF89a not a png"),
    ]
    for doc_id, payload in rows[1:]:
        assert _png_decode_rgb(payload) is None, doc_id
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = png_pixel_stats(df).collect()
    assert sorted(set(r["doc_id"] for r in out)) == [1]
    assert len(out) == 3


def test_png_decode_quarantines_deflate_bomb():
    """A valid-CRC payload whose IHDR declares tiny dims but whose IDAT
    inflates far past the declared scanline length must quarantine WITHOUT
    materializing the inflated stream — the decoder caps the inflate at
    expected+1 bytes, so the ~64 MB this stream would expand to is never
    allocated (the ADVICE r10 zlib-bomb hole)."""
    from logspout_kinesis_tests_spark.operators.multimodal import _png_decode_rgb

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # IHDR says 2x2 RGB (expected plain = 2*(2*3+1) = 14 bytes) but the
    # deflate stream holds 64 MiB of zeros (~64 KiB compressed).
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * (64 << 20)))
        + chunk(b"IEND", b"")
    )
    assert _png_decode_rgb(bomb) is None

    # A truncated-but-valid-prefix deflate stream (decompressobj does not
    # raise on truncation the way zlib.decompress does) must also skip.
    full = zlib.compress(b"\x00" * 14)
    truncated = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", full[: len(full) - 3])
        + chunk(b"IEND", b"")
    )
    assert _png_decode_rgb(truncated) is None
