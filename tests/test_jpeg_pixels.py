"""REAL JPEG pixel decode (operators/multimodal.py jpeg_pixel_stats).

Evidence strategy, same as the PNG/GIF paths: the fixture encoder and the
product decoder share NOTHING but the T.81 spec (separate canonical-code
builders, separate bit I/O, separate stuffing), and the DC-only payloads
have a CLOSED-FORM decode (IDCT of a DC-only block is a constant), so
tests pin decoded pixels against the FORMULA — a bug symmetric in encoder
and decoder still can't pass.  The AC path is pinned against an
independent in-test IDCT.
"""

from __future__ import annotations

import math

import numpy as np

from logspout_kinesis_tests_spark.operators.multimodal import (
    _JPEG_DC_ONLY_Q,
    _jpeg_decode_rgb,
    _jpeg_encode_blocks,
)


def _formula_rgb(d: int, width: int, height: int) -> np.ndarray:
    """Closed-form expected pixels for synth_jpeg_pixel_payload(d)."""
    out = np.zeros((height, width, 3), dtype=np.uint8)
    for by in range(height // 8):
        for bx in range(width // 8):
            y = (d * 7 + by * 13 + bx * 5) % 256
            cb = (d * 11 + by * 3 + bx * 7) % 256
            cr = (d * 13 + by * 5 + bx * 11) % 256
            r = min(255, max(0, math.floor(y + 1.402 * (cr - 128) + 0.5)))
            g = min(
                255,
                max(
                    0,
                    math.floor(
                        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5
                    ),
                ),
            )
            b = min(255, max(0, math.floor(y + 1.772 * (cb - 128) + 0.5)))
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (r, g, b)
    return out


def test_jpeg_dc_only_decode_matches_closed_form():
    """Every pixel of a DC-only 4:4:4 stream equals the block-constant
    formula — covers DC diff coding across blocks (predictors), Huffman
    table carriage, and the JFIF color conversion."""
    for d in (0, 3, 117, 255):
        w, h = 24, 16
        blocks = np.zeros((h // 8, w // 8, 3, 64), dtype=np.int64)
        for by in range(h // 8):
            for bx in range(w // 8):
                blocks[by, bx, 0, 0] = (d * 7 + by * 13 + bx * 5) % 256 - 128
                blocks[by, bx, 1, 0] = (d * 11 + by * 3 + bx * 7) % 256 - 128
                blocks[by, bx, 2, 0] = (d * 13 + by * 5 + bx * 11) % 256 - 128
        px = _jpeg_decode_rgb(_jpeg_encode_blocks(w, h, blocks))
        assert px is not None
        assert (px == _formula_rgb(d, w, h)).all(), d


def test_jpeg_ac_coefficients_match_independent_idct():
    """Planted AC coefficients (run-lengths, ZRL-free and ZRL-bearing
    positions, negative values) decode to the pixels of an IDCT computed
    INDEPENDENTLY in this test."""
    blocks = np.zeros((1, 2, 3, 64), dtype=np.int64)
    blocks[0, 0, 0, 0] = 20
    blocks[0, 0, 0, 1] = 5
    blocks[0, 0, 0, 9] = -3
    blocks[0, 0, 0, 63] = 2  # long zero run before the last coefficient
    blocks[0, 1, 0, 0] = -10
    blocks[0, 1, 0, 16] = 7
    px = _jpeg_decode_rgb(_jpeg_encode_blocks(16, 8, blocks))
    assert px is not None

    def idct(vec):
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        basis = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        basis[0, :] *= 1 / np.sqrt(2.0)
        f = (vec * _JPEG_DC_ONLY_Q).reshape(8, 8).astype(float)
        return np.clip(np.floor(basis.T @ f @ basis + 128.5), 0, 255)

    y = np.concatenate([idct(blocks[0, 0, 0]), idct(blocks[0, 1, 0])], axis=1)
    red = np.clip(np.floor(y + 1.402 * 0.0 + 0.5), 0, 255).astype(np.uint8)
    assert (px[:, :, 0] == red).all()


def test_jpeg_restart_markers_decode_identically():
    """A DRI=2 stream with RST markers and predictor resets must decode
    byte-identically to the unrestarted stream of the same blocks."""
    blocks = np.zeros((2, 2, 3, 64), dtype=np.int64)
    for by in range(2):
        for bx in range(2):
            blocks[by, bx, 0, 0] = 30 * by - 20 * bx
    plain = _jpeg_decode_rgb(_jpeg_encode_blocks(16, 16, blocks))
    rst = _jpeg_decode_rgb(_jpeg_encode_blocks(16, 16, blocks, dri=2))
    assert plain is not None and rst is not None
    assert (plain == rst).all()


def test_jpeg_fill_bytes_before_marker_decode_identically():
    """T.81 B.1.1.2: 0xFF fill bytes may pad the space before any marker —
    a padded stream must decode identically, not quarantine (ADVICE r11)."""
    blocks = np.zeros((1, 1, 3, 64), dtype=np.int64)
    blocks[0, 0, 0, 0] = 17
    good = _jpeg_encode_blocks(8, 8, blocks)
    plain = _jpeg_decode_rgb(good)
    assert plain is not None
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        padded = good.replace(marker, b"\xff\xff\xff" + marker, 1)
        got = _jpeg_decode_rgb(padded)
        assert got is not None, f"fill bytes before {marker!r} quarantined"
        assert (got == plain).all()
    # fill bytes running off the end of the stream must quarantine, not raise
    assert _jpeg_decode_rgb(good[:2] + b"\xff" * 6) is None


def test_jpeg_quarantines_out_of_scope_and_malformed():
    """Progressive SOF2, subsampled components, truncation, oversize IHDR
    dims, and garbage must all skip — never mis-decode, never raise."""
    blocks = np.zeros((1, 1, 3, 64), dtype=np.int64)
    good = _jpeg_encode_blocks(8, 8, blocks)
    assert _jpeg_decode_rgb(good) is not None
    assert _jpeg_decode_rgb(good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    assert _jpeg_decode_rgb(good[: len(good) // 2]) is None
    sub = bytearray(good)
    i = good.index(bytes([1, 0x11, 0]))
    sub[i + 1] = 0x22  # 2x2 sampling on Y: out of scope
    assert _jpeg_decode_rgb(bytes(sub)) is None
    assert _jpeg_decode_rgb(b"\xff\xd8 not a jpeg") is None
    assert _jpeg_decode_rgb(b"") is None
    import struct

    big = bytearray(good)
    j = good.index(struct.pack(">BHHB", 8, 8, 8, 3))
    big[j + 1 : j + 5] = struct.pack(">HH", 30000, 30000)  # 9e8 pixels
    assert _jpeg_decode_rgb(bytes(big)) is None


def test_jpeg_pixel_stats_spark_path(spark):
    """The mapInPandas operator over a batch mixing valid synth payloads
    and poison rows: stats equal the closed form, poison skipped."""
    from logspout_kinesis_tests_spark.operators.multimodal import (
        jpeg_pixel_stats,
        synth_jpeg_pixel_payload,
    )

    ids = [1, 9, 200]
    docs = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    payloads = synth_jpeg_pixel_payload(docs, width=24, height=16).collect()
    rows = [(r["doc_id"], bytes(r["payload"])) for r in payloads]
    rows.append((999, b"\xff\xd8 poison"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {(r["doc_id"], r["channel"]): r for r in jpeg_pixel_stats(df).collect()}
    assert len(out) == len(ids) * 3
    for d in ids:
        exp = _formula_rgb(d, 24, 16)
        for ch in range(3):
            plane = exp[:, :, ch]
            row = out[(d, ch)]
            assert row["n_pixels"] == plane.size
            assert row["sum_val"] == int(plane.sum(dtype=np.int64))
            assert row["min_val"] == int(plane.min())
            assert row["max_val"] == int(plane.max())


def test_jpeg_restart_marker_after_ff_padding_decodes():
    """Review-found (r11): entropy bits that pad to 0xFF before a RST
    marker carry a stuffed 0x00 the aligner must skip — an AC coefficient
    at the last zigzag slot with dri=1 produces exactly that byte
    sequence, and the decoder used to quarantine its own encoder's valid
    output (~1/256 of restarts on real streams)."""
    blocks = np.zeros((1, 2, 3, 64), dtype=np.int64)
    blocks[0, 0, 0, 63] = 3  # long run then a coefficient: bit patterns
    blocks[0, 1, 0, 0] = -5  # that historically padded to 0xFF
    raw = _jpeg_encode_blocks(16, 8, blocks, dri=1)
    plain = _jpeg_decode_rgb(_jpeg_encode_blocks(16, 8, blocks))
    rst = _jpeg_decode_rgb(raw)
    assert plain is not None and rst is not None
    assert (plain == rst).all()


def test_jpeg_quarantines_duplicate_sos_selector_and_bad_dht_class():
    """Review-found (r11): a duplicate SOS component selector used to
    crash the unpack (TypeError, killing the Spark task) instead of
    quarantining; a DHT table class outside {0,1} used to be silently
    installed as an AC table (mis-decode risk)."""
    blocks = np.zeros((1, 1, 3, 64), dtype=np.int64)
    good = _jpeg_encode_blocks(8, 8, blocks)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    dup = good.replace(sos, bytes([3, 1, 0x00, 1, 0x00, 1, 0x00, 0, 63, 0]))
    assert dup != good
    assert _jpeg_decode_rgb(dup) is None  # was: TypeError
    bad_dht = good.replace(b"\xff\xc4", b"\xff\xc4", 1)
    i = good.index(b"\xff\xc4")  # first DHT: tc/th byte sits 4 bytes in
    mut = bytearray(good)
    mut[i + 4] = 0x30  # table class 3: spec-invalid
    assert _jpeg_decode_rgb(bytes(mut)) is None


def test_jpeg_randomized_coefficient_sweep_matches_independent_idct():
    """Seeded randomized sweep: 25 block grids with random sparse DC+AC
    coefficients (values spanning all magnitude categories the fixture
    tables carry), DRI alternating on/off — every decoded Y pixel must
    equal an IDCT computed independently in this test.  Catches
    run-length/category/EXTEND edge combinations no hand-written case
    enumerates."""
    rng = np.random.RandomState(1234)

    def idct(vec):
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        basis = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        basis[0, :] *= 1 / np.sqrt(2.0)
        f = (vec * _JPEG_DC_ONLY_Q).reshape(8, 8).astype(float)
        return np.clip(np.floor(basis.T @ f @ basis + 128.5), 0, 255).astype(
            np.uint8
        )

    for trial in range(25):
        bh, bw = int(rng.randint(1, 3)), int(rng.randint(1, 4))
        blocks = np.zeros((bh, bw, 3, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                for ci in range(3):
                    n_coef = int(rng.randint(0, 8))
                    pos = rng.choice(64, size=n_coef, replace=False)
                    # category <= 10 (the fixture AC table's size range);
                    # draw across small and large magnitudes
                    vals = rng.randint(-1000, 1001, size=n_coef)
                    for p, v in zip(pos, vals):
                        blocks[by, bx, ci, int(p)] = int(v)
        dri = int(rng.randint(0, 3))  # 0 = off
        px = _jpeg_decode_rgb(
            _jpeg_encode_blocks(bw * 8, bh * 8, blocks, dri=dri)
        )
        assert px is not None, trial
        # replay the full pipeline independently (all three channels)
        y = np.block([[idct(blocks[by, bx, 0]) for bx in range(bw)] for by in range(bh)]).astype(float)
        cb = np.block([[idct(blocks[by, bx, 1]) for bx in range(bw)] for by in range(bh)]).astype(float) - 128.0
        cr = np.block([[idct(blocks[by, bx, 2]) for bx in range(bw)] for by in range(bh)]).astype(float) - 128.0
        exp_r = np.clip(np.floor(y + 1.402 * cr + 0.5), 0, 255).astype(np.uint8)
        exp_g = np.clip(
            np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5), 0, 255
        ).astype(np.uint8)
        exp_b = np.clip(np.floor(y + 1.772 * cb + 0.5), 0, 255).astype(np.uint8)
        assert (px[:, :, 0] == exp_r).all(), trial
        assert (px[:, :, 1] == exp_g).all(), trial
        assert (px[:, :, 2] == exp_b).all(), trial


def test_jpeg_non_multiple_of_8_dimensions_crop():
    """SOF dims that are not block multiples: the MCU grid covers the
    ceiling, the decoder must CROP to the declared w x h (T.81 A.2.1)."""
    blocks = np.zeros((2, 3, 3, 64), dtype=np.int64)
    for by in range(2):
        for bx in range(3):
            blocks[by, bx, 0, 0] = 10 * by + 5 * bx
    raw = _jpeg_encode_blocks(20, 12, blocks)  # 3x2 MCUs, declared 20x12
    px = _jpeg_decode_rgb(raw)
    assert px is not None and px.shape == (12, 20, 3)
    full = _jpeg_decode_rgb(_jpeg_encode_blocks(24, 16, blocks))
    assert (px == full[:12, :20]).all()
