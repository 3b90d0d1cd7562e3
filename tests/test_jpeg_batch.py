"""Lockstep batch JPEG decoder vs the scalar decoder — bit-identity.

``decode_jpeg_batch`` promises results identical to per-payload
``decode_jpeg`` calls: same uint8 arrays on success, the same
ValueError (same message) on failure, aligned by index. These tests pin
that promise on a corpus that exercises every lockstep branch: varied
content, 4:4:4 vs 4:2:0 sampling groups, grayscale, odd dimensions,
malformed payloads mixed in, and the memory-capped group slicing. Most
tests lower ``_LOCKSTEP_MIN`` (the measured perf crossover, ~256 — see
the constant's comment in jpeg.py) so the lockstep path runs on small
fast corpora; one test runs at genuine production width. The video
demuxers (`avi.py`/`mp4.py`) route frame lists through
``decode_jpeg_frames``, pinned here against a sequential decode loop.
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_log_ingestion_spark.operators import jpeg as jpeg_mod
from aws_log_ingestion_spark.operators.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from aws_log_ingestion_spark.operators.jpeg import (
    decode_jpeg,
    decode_jpeg_batch,
    decode_jpeg_frames,
    encode_jpeg,
)
from aws_log_ingestion_spark.operators.mp4 import (
    decode_mp4_mjpeg,
    encode_mp4_mjpeg,
)


@pytest.fixture
def lockstep(monkeypatch):
    """Force the lockstep path for small corpora (the production
    threshold is a perf crossover, not a correctness bound)."""
    monkeypatch.setattr(jpeg_mod, "_LOCKSTEP_MIN", 4)


def _img(seed: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _scalar_outcome(payload: bytes):
    try:
        return decode_jpeg(payload)
    except ValueError as e:
        return e


def _assert_aligned(payloads):
    outs = decode_jpeg_batch(payloads)
    assert len(outs) == len(payloads)
    for i, (p, got) in enumerate(zip(payloads, outs)):
        want = _scalar_outcome(p)
        if isinstance(want, Exception):
            assert isinstance(got, ValueError), f"row {i}: expected error"
            assert str(got) == str(want), f"row {i}: error text differs"
        else:
            assert isinstance(got, np.ndarray), f"row {i}: expected array"
            assert got.dtype == want.dtype and got.shape == want.shape
            assert np.array_equal(got, want), f"row {i}: pixels differ"


def test_batch_identity_varied_444_corpus(lockstep):
    payloads = [
        encode_jpeg(_img(s, 24 + (s % 3) * 8, 32 + (s % 5) * 8), quality=70)
        for s in range(24)
    ]
    _assert_aligned(payloads)


def test_batch_identity_420_and_mixed_sampling_groups(lockstep):
    p444 = [encode_jpeg(_img(s, 32, 32), quality=60) for s in range(10)]
    p420 = [
        encode_jpeg(_img(100 + s, 40, 48), quality=60, subsample=True)
        for s in range(10)
    ]
    # interleave so grouping (by sampling structure) must reorder
    mixed = [p for pair in zip(p444, p420) for p in pair]
    _assert_aligned(mixed)


def test_batch_identity_odd_dims_and_grayscale(lockstep):
    rng = np.random.default_rng(7)
    grays = [
        encode_jpeg(
            rng.integers(0, 256, size=(19 + s, 23 + s, 1), dtype=np.uint8),
            quality=80,
        )
        for s in range(9)
    ]
    odd = [
        encode_jpeg(_img(200 + s, 17, 29), quality=85, subsample=True)
        for s in range(9)
    ]
    _assert_aligned(grays + odd)


def test_batch_identity_with_malformed_rows_mixed_in(lockstep):
    good = [encode_jpeg(_img(s, 32, 32), quality=70) for s in range(12)]
    bad = [
        b"",  # empty
        b"\x00" * 64,  # not a JPEG at all
        good[0][: len(good[0]) // 2],  # truncated entropy stream
        good[1][:20],  # truncated in the headers
        b"\xff\xd8\xff\xc2" + good[2][4:],  # progressive SOF marker
    ]
    payloads = good[:6] + bad + good[6:]
    _assert_aligned(payloads)


def test_batch_below_crossover_takes_scalar_path():
    # production threshold: a narrow batch must still return aligned
    # results (via the scalar loop) — no monkeypatch here
    payloads = [encode_jpeg(_img(s, 16, 16), quality=90) for s in range(3)]
    payloads.append(b"junk")
    _assert_aligned(payloads)


def test_batch_identity_at_production_width():
    # a genuine >=_LOCKSTEP_MIN corpus: the real lockstep path with no
    # monkeypatch, tiny frames so the test stays fast
    payloads = [
        encode_jpeg(_img(s, 16, 16), quality=85) for s in range(280)
    ]
    payloads[40] = payloads[40][:30]  # one malformed row mid-batch
    _assert_aligned(payloads)


def test_batch_group_slicing_by_memory_cap(lockstep, monkeypatch):
    # force multiple lockstep slices: cap the zz store below one group's
    # total so the slicer must split, results still aligned
    monkeypatch.setattr(jpeg_mod, "_LOCKSTEP_ZZ_BYTES", 1 << 12)
    payloads = [encode_jpeg(_img(s, 32, 32), quality=70) for s in range(20)]
    _assert_aligned(payloads)


def test_decode_jpeg_frames_matches_sequential_loop(lockstep):
    blobs = [encode_jpeg(_img(s, 24, 24), quality=75) for s in range(16)]
    seq = [decode_jpeg(b) for b in blobs]
    got = decode_jpeg_frames(blobs)
    assert len(got) == len(seq)
    for a, b in zip(got, seq):
        assert np.array_equal(a, b)


def test_decode_jpeg_frames_raises_first_error(lockstep):
    blobs = [encode_jpeg(_img(s, 24, 24), quality=75) for s in range(10)]
    blobs[3] = blobs[3][: len(blobs[3]) - 40]  # truncate frame 3
    blobs[7] = b"junk"
    with pytest.raises(ValueError) as exc:
        decode_jpeg_frames(blobs)
    want = _scalar_outcome(blobs[3])
    assert str(exc.value) == str(want)


def test_batch_identity_dri_corpus(lockstep):
    # restart-interval images fan out into one lane per segment; mixed
    # intervals (incl. none) in one sampling group must stay aligned
    payloads = [
        encode_jpeg(_img(s, 40, 56), quality=70, restart_interval=ri)
        for s, ri in enumerate([0, 1, 2, 3, 5, 7, 13, 100, 0, 4])
    ]
    payloads.append(payloads[4][:-25])  # truncated mid-segment
    _assert_aligned(payloads)


def test_single_dri_image_routes_through_lanes(lockstep):
    # one image, many restart segments: public decode_jpeg takes the
    # lockstep lanes and must match the pure scalar decoder bit-for-bit
    p = encode_jpeg(_img(3, 64, 96), quality=75, restart_interval=1)
    info = jpeg_mod._parse_jpeg(p)
    assert jpeg_mod._scan_lanes(info) == 96  # 8x12 MCUs, one lane each
    got = decode_jpeg(p)
    want = jpeg_mod._decode_jpeg(p)
    assert np.array_equal(got, want)


def test_dri_truncated_at_marker_boundary_error_parity(lockstep):
    # chop the stream right after an RSTn marker: fewer segments on the
    # wire than lanes -> the batch pre-fails the image and the scalar
    # redecode must surface the scalar decoder's exact truncation error
    p = encode_jpeg(_img(9, 48, 48), quality=70, restart_interval=2)
    body = p[2:]
    rst = body.index(b"\xff\xd4")  # a mid-stream restart marker
    cut = p[: 2 + rst + 2] + b"\xff\xd9"
    _assert_aligned([cut, p])


def test_frames_short_dri_clip_takes_lane_path(lockstep, monkeypatch):
    # a clip far below the frame-count crossover still locksteps when
    # per-frame restart lanes multiply the width past it — pin that the
    # batch path actually runs (scalar loop would not call _decode_group)
    monkeypatch.setattr(jpeg_mod, "_LOCKSTEP_MIN", 12)
    frames = [_img(40 + s, 32, 32) for s in range(4)]
    blobs = [encode_jpeg(f, quality=75, restart_interval=2) for f in frames]
    calls = []
    orig = jpeg_mod._decode_group
    monkeypatch.setattr(
        jpeg_mod,
        "_decode_group",
        lambda items, results: calls.append(len(items)) or orig(items, results),
    )
    got = decode_jpeg_frames(blobs)
    assert calls, "short DRI clip should route through the lockstep group"
    seq = [jpeg_mod._decode_jpeg(b) for b in blobs]
    for a, b in zip(got, seq):
        assert np.array_equal(a, b)


def test_avi_and_mp4_roundtrip_through_batch_path(lockstep):
    # constant frames are DC-exact so the round trip is bit-exact; the
    # lowered threshold routes all three containers through lockstep
    frames = [
        np.full((16, 16, 3), 16 * i + 8, dtype=np.uint8) for i in range(9)
    ]
    for blob in (
        encode_avi_mjpeg(frames, fps=10, quality=50),
        encode_mp4_mjpeg(frames, fps=10, quality=50),
        encode_mp4_mjpeg(frames, fps=10, quality=50, fragment_size=2),
    ):
        dec, fps = (
            decode_avi_mjpeg(blob)
            if blob[:4] == b"RIFF"
            else decode_mp4_mjpeg(blob)
        )
        assert fps == 10 and len(dec) == 9
        for a, b in zip(dec, frames):
            assert np.array_equal(a, b)
