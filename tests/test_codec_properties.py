"""Property-style tests for the pure-Python media codecs (no Spark):
randomized-but-seeded images through the JPEG/AVI/MP4 round trips, with
the invariants a decoder must hold regardless of content — shape
preservation, bounded DCT error, DC-exactness for even constants, and
malformed-input isolation (ValueError, never a wrong answer)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from aws_log_ingestion_spark.operators.avi import decode_avi_mjpeg, encode_avi_mjpeg
from aws_log_ingestion_spark.operators.jpeg import decode_jpeg, encode_jpeg
from aws_log_ingestion_spark.operators.mp4 import decode_mp4_mjpeg, encode_mp4_mjpeg

dims = st.integers(min_value=1, max_value=24)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1), q=st.sampled_from([50, 75, 90]))
def test_jpeg_round_trip_shape_and_bounded_error(h, w, seed, q):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=q))
    assert out.shape == img.shape
    # random noise is the DCT worst case; the bound is loose but a
    # broken entropy decode / dequantize / IDCT blows far past it
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 48


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1), ri=st.integers(1, 9))
def test_jpeg_restart_interval_decode_identical(h, w, seed, ri):
    """DRI re-frames the entropy stream without touching coefficients:
    decoded pixels match the no-DRI encode exactly, whichever decode
    path (scalar or restart-lane lockstep) the interval selects."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=75, restart_interval=ri)),
        decode_jpeg(encode_jpeg(img, quality=75)),
    )


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, v=st.integers(0, 127))
def test_jpeg_even_constant_is_dc_exact(h, w, v):
    """Even constant-gray images round-trip bit-exactly at quality 50
    (luma DC quantizer 16 divides 8*(v-128) with v even; chroma DC 0) —
    the invariant every DC-exact driver fixture rests on."""
    img = np.full((h, w, 3), v * 2, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert (out == v * 2).all()


@settings(max_examples=20, deadline=None)
@given(
    h=dims,
    w=dims,
    vals=st.lists(st.integers(0, 127), min_size=1, max_size=4),
    fps=st.integers(1, 60),
    container=st.sampled_from(["avi", "mp4"]),
)
def test_video_containers_round_trip_dc_exact(h, w, vals, fps, container):
    """Both video containers carry the same JPEG samples: frame count,
    fps and every even-constant frame survive exactly."""
    frames = [np.full((h, w, 3), v * 2, dtype=np.uint8) for v in vals]
    enc, dec = (
        (encode_avi_mjpeg, decode_avi_mjpeg)
        if container == "avi"
        else (encode_mp4_mjpeg, decode_mp4_mjpeg)
    )
    out, got_fps = dec(enc(frames, fps=fps, quality=50))
    assert got_fps == fps
    assert len(out) == len(frames)
    for o, v in zip(out, vals):
        assert o.shape == (h, w, 3)
        assert (o == v * 2).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    cut=st.floats(0.05, 0.95),
    container=st.sampled_from(["jpeg", "avi", "mp4"]),
)
def test_truncation_never_returns_wrong_output(seed, cut, container):
    """Any prefix truncation must raise ValueError — never decode to a
    silently wrong array (the per-row fallback isolation contract)."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    if container == "jpeg":
        payload = encode_jpeg(img, quality=75)
        dec = decode_jpeg
    elif container == "avi":
        payload = encode_avi_mjpeg([img, img], fps=10)
        dec = decode_avi_mjpeg
    else:
        payload = encode_mp4_mjpeg([img, img], fps=10)
        dec = decode_mp4_mjpeg
    n = max(1, int(len(payload) * cut))
    try:
        out = dec(payload[:n])
    except ValueError:
        return  # the required behavior
    # a prefix that still parses must only happen when nothing was lost
    # (cut landed past all meaningful bytes) — verify the decode is right
    if container == "jpeg":
        assert out.shape == img.shape
    else:
        frames, _ = out
        assert len(frames) == 2 and frames[0].shape == img.shape


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=256))
def test_arbitrary_bytes_never_crash_uncontrolled(data):
    """Garbage never escapes as anything but ValueError/NotImplemented
    (mp4 may legitimately classify a recognized inter-frame codec)."""
    for dec in (decode_jpeg, decode_avi_mjpeg, decode_mp4_mjpeg):
        with pytest.raises((ValueError, NotImplementedError)):
            dec(data)


def _mutation_corpus():
    """One small valid payload per decoder — mutations of these reach
    DEEP parser states (random garbage dies at the magic check)."""
    from aws_log_ingestion_spark.operators.multimodal import (
        decode_bmp, decode_png, decode_wav, encode_bmp, encode_png, encode_wav,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    pcm = rng.randint(-500, 500, (64, 2)).astype(np.int32)
    return [
        (encode_jpeg(img, quality=75), decode_jpeg),
        (encode_jpeg(img, quality=75, restart_interval=1), decode_jpeg),
        (encode_avi_mjpeg([img, img], fps=10), decode_avi_mjpeg),
        (encode_mp4_mjpeg([img, img], fps=10), decode_mp4_mjpeg),
        (encode_png(img), decode_png),
        (encode_bmp(img), decode_bmp),
        (encode_wav(pcm), decode_wav),
    ]


_MUTATION_CORPUS = _mutation_corpus()


@settings(max_examples=120, deadline=None)
@given(
    which=st.integers(0, len(_MUTATION_CORPUS) - 1),
    flips=st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(0, 255)),
        min_size=1,
        max_size=4,
    ),
)
def test_mutated_valid_payloads_stay_on_valueerror_path(which, flips):
    """Byte-flip a VALID payload anywhere: every decoder must either
    still decode or raise ValueError/NotImplementedError — never
    struct.error, ZeroDivisionError, MemoryError, or a numpy shape
    error (the per-row fallback isolation contract; the ADVICE-r5 mp4
    stsz and r6 JPEG-SOF/WAV-fmt findings were all this class)."""
    payload, dec = _MUTATION_CORPUS[which]
    buf = bytearray(payload)
    for pos, val in flips:
        buf[pos % len(buf)] = val
    try:
        dec(bytes(buf))
    except (ValueError, NotImplementedError):
        pass  # the contract; a successful decode is equally fine
