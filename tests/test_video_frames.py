"""REAL video frame decode at the MJPEG-in-AVI baseline
(operators/multimodal.py video_frame_stats).

Same evidence strategy as the image tiers: fixture encoder and product
decoder share only the RIFF-AVI + T.81 specs; DC-only frames have a
closed-form decode, so stats are pinned against the FORMULA.  Container
quarantine and the frame-vs-container failure grain (one corrupt frame
drops that frame, not the clip) get their own cases.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from logspout_kinesis_tests_spark.operators.multimodal import (
    _avi_mjpeg_frames,
    _jpeg_decode_rgb,
)


def _formula_frame_stats(d: int, f: int, width: int, height: int) -> dict:
    """(channel) -> (n, sum, min, max) replayed from the generator formula."""
    out = {}
    for ch in range(3):
        tot, mn, mx = 0, 255, 0
        for by in range(height // 8):
            for bx in range(width // 8):
                y = (d * 7 + f * 17 + by * 13 + bx * 5) % 256
                cb = (d * 11 + f * 19 + by * 3 + bx * 7) % 256
                cr = (d * 13 + f * 23 + by * 5 + bx * 11) % 256
                if ch == 0:
                    v = y + 1.402 * (cr - 128)
                elif ch == 1:
                    v = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
                else:
                    v = y + 1.772 * (cb - 128)
                v = min(255, max(0, math.floor(v + 0.5)))
                tot += 64 * v
                mn, mx = min(mn, v), max(mx, v)
        out[ch] = (width * height, tot, mn, mx)
    return out


def _one_avi(spark, d: int, n_frames: int = 6) -> bytes:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        synth_mjpeg_avi_payload,
    )

    row = synth_mjpeg_avi_payload(
        spark.createDataFrame([(d,)], "doc_id long"), n_frames=n_frames
    ).collect()[0]
    return bytes(row["payload"])


def test_avi_container_walk_and_frame_decode(spark):
    raw = _one_avi(spark, 7)
    frames = _avi_mjpeg_frames(raw)
    assert frames is not None and len(frames) == 6
    for f, fb in enumerate(frames):
        px = _jpeg_decode_rgb(fb)
        assert px is not None and px.shape == (16, 24, 3)
        exp = _formula_frame_stats(7, f, 24, 16)
        for ch in range(3):
            plane = px[:, :, ch]
            n, s, mn, mx = exp[ch]
            assert int(plane.sum(dtype=np.int64)) == s and plane.size == n
            assert int(plane.min()) == mn and int(plane.max()) == mx


def test_video_frame_stats_samples_and_matches_formula(spark):
    from logspout_kinesis_tests_spark.operators.multimodal import (
        video_frame_stats,
    )

    raw = _one_avi(spark, 11)
    df = spark.createDataFrame([(11, raw)], "doc_id long, payload binary")
    out = {(r["frame_idx"], r["channel"]): r for r in video_frame_stats(df, every=2).collect()}
    assert sorted({fi for fi, _ in out}) == [0, 2, 4]  # every 2nd frame
    for fi in (0, 2, 4):
        exp = _formula_frame_stats(11, fi, 24, 16)
        for ch in range(3):
            n, s, mn, mx = exp[ch]
            row = out[(fi, ch)]
            assert (row["n_pixels"], row["sum_val"], row["min_val"], row["max_val"]) == (n, s, mn, mx)


def test_video_quarantines_container_but_tolerates_frame_corruption(spark):
    from logspout_kinesis_tests_spark.operators.multimodal import (
        video_frame_stats,
    )

    raw = _one_avi(spark, 3)

    # container-grain quarantine: wrong RIFF type, truncation, non-MJPG
    assert _avi_mjpeg_frames(raw.replace(b"AVI ", b"WAVE", 1)) is None
    assert _avi_mjpeg_frames(raw[: len(raw) // 2]) is None
    assert _avi_mjpeg_frames(raw.replace(b"MJPG", b"H264", 1)) is None
    assert _avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00AVI ") is None

    # frame-grain tolerance: corrupt ONE sampled frame's JPEG bytes — that
    # frame's rows disappear, the other frames still decode
    frames = _avi_mjpeg_frames(raw)
    bad = bytearray(raw)
    target = frames[2]
    i = raw.index(target)
    bad[i : i + 2] = b"\x00\x00"  # destroy frame 2's SOI
    df = spark.createDataFrame(
        [(3, bytes(bad))], "doc_id long, payload binary"
    )
    out = video_frame_stats(df, every=2).collect()
    assert sorted({r["frame_idx"] for r in out}) == [0, 4]


def test_video_pixel_budget_quarantines_payload(spark, monkeypatch):
    from logspout_kinesis_tests_spark.operators import multimodal as m

    raw = _one_avi(spark, 3)
    frames = _avi_mjpeg_frames(raw)
    assert frames is not None
    # 3 sampled frames x 384 px = 1152 > 1000: the budget policy drops the
    # WHOLE payload (partial stats would silently misrepresent the clip)
    monkeypatch.setattr(m, "VIDEO_MAX_PIXELS", 1000)
    df = spark.createDataFrame([(3, raw)], "doc_id long, payload binary")
    assert m.video_frame_stats(df, every=2).count() == 0


def test_video_budget_rejects_oversize_sof_before_decode(spark):
    """ADVICE r11: a frame whose SOF header declares over-budget dimensions
    must quarantine the payload from the cheap header peek — without paying
    the pure-Python Huffman/IDCT decode for the overflowing frame."""
    from logspout_kinesis_tests_spark.operators import multimodal as m

    raw = _one_avi(spark, 3)
    frames = _avi_mjpeg_frames(raw)
    import struct

    f0 = frames[0]
    # SOF0 payload: precision(1) height(2) width(2) — blow up the declared
    # dims without touching the (now inconsistent) entropy data
    i = f0.index(b"\xff\xc0")
    big = f0[: i + 5] + struct.pack(">HH", 30000, 30000) + f0[i + 9 :]
    assert m._jpeg_peek_dims(big) == (30000, 30000)
    # the FULL decoder rejects this frame (oversize guard) — so the old
    # decode-first flow would merely SKIP frame 0 and keep frames 2/4;
    # only the pre-decode header peek quarantines the whole payload
    assert m._jpeg_decode_rgb(big) is None
    patched = raw.replace(f0, big, 1)
    df = spark.createDataFrame([(9, patched)], "doc_id long, payload binary")
    assert m.video_frame_stats(df, every=2).count() == 0


def test_jpeg_peek_dims_contract():
    from logspout_kinesis_tests_spark.operators import multimodal as m

    blocks = np.zeros((1, 2, 3, 64), dtype=np.int64)
    good = m._jpeg_encode_blocks(16, 8, blocks)
    assert m._jpeg_peek_dims(good) == (8, 16)
    assert m._jpeg_peek_dims(good) == m._jpeg_decode_rgb(good).shape[:2]
    # fill bytes before SOF are spec-legal padding
    assert m._jpeg_peek_dims(good.replace(b"\xff\xc0", b"\xff\xff\xc0", 1)) == (8, 16)
    # progressive SOF2, garbage, truncation → None
    assert m._jpeg_peek_dims(good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    assert m._jpeg_peek_dims(b"\xff\xd8 junk") is None
    assert m._jpeg_peek_dims(good[:4]) is None


def test_avi_second_stream_chunks_are_not_frames(spark):
    """Review-found (r11): '01dc' chunks of an unverified second stream
    must not masquerade as frames of the verified MJPG stream 00."""
    import struct as _struct

    raw = _one_avi(spark, 3)
    frames = _avi_mjpeg_frames(raw)
    assert frames is not None and len(frames) == 6
    # splice a '01dc' chunk (garbage body) into movi, fixing up sizes
    i = raw.index(b"LIST")
    i = raw.index(b"movi")  # start of the movi list type tag
    insert_at = i + 4  # right after 'movi'
    alien = b"01dc" + _struct.pack("<I", 4) + b"JUNK"
    mut = bytearray(raw)
    mut[insert_at:insert_at] = alien
    # the LIST size field sits 4 bytes before its 'movi' type tag
    # ('LIST' + size + 'movi'); the RIFF size at offset 4
    (movi_sz,) = _struct.unpack("<I", bytes(mut[i - 4 : i]))
    mut[i - 4 : i] = _struct.pack("<I", movi_sz + len(alien))
    (riff_sz,) = _struct.unpack("<I", bytes(mut[4:8]))
    mut[4:8] = _struct.pack("<I", riff_sz + len(alien))
    frames2 = _avi_mjpeg_frames(bytes(mut))
    assert frames2 is not None and len(frames2) == 6  # alien chunk ignored
    assert [len(f) for f in frames2] == [len(f) for f in frames]
