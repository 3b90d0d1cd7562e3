"""Baseline JPEG codec: decoder verified against hand-built fixtures
whose bytes and expected pixels come straight from ITU-T T.81 arithmetic
(no shared code with the package encoder), plus lossy round-trips with
bounded error through the package encoder and the Spark media operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_log_ingestion_spark.operators import multimodal
from aws_log_ingestion_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dc_only_jpeg(widths_blocks: int, dc_values, restart: bool = False) -> bytes:
    """Hand-built 8x(8*n) grayscale baseline JPEG, one DC-only block per
    MCU, quant table all 16s. Huffman tables are written directly:
    DC table = single 2-bit code '00' meaning category 4; AC table =
    single 2-bit code '00' meaning EOB. Entropy bytes are assembled by
    hand: '00' + 4 magnitude bits + '00' = exactly one byte per block.

    Expected pixel value per T.81: dequantized DC = dc*16; IDCT of a
    DC-only block is the constant DC/8; + level shift 128 ->
    pixel = dc*2 + 128 (exact integers, no rounding ambiguity)."""
    out = b"\xff\xd8"
    out += _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8 * widths_blocks, 1) + bytes([1, 0x11, 0]))
    # DC: counts=[0,1,0...] (one 2-bit code), symbol = category 4
    out += _seg(0xC4, bytes([0x00] + [0, 1] + [0] * 14 + [4]))
    # AC: counts=[0,1,0...], symbol = 0x00 (EOB)
    out += _seg(0xC4, bytes([0x10] + [0, 1] + [0] * 14 + [0x00]))
    if restart:
        out += _seg(0xDD, struct.pack(">H", 1))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    entropy = b""
    for i, dc in enumerate(dc_values):
        # category-4 magnitude bits: v>0 -> v; v<0 -> v + 15
        bits = dc if dc > 0 else dc + 15
        entropy += bytes([(0b00 << 6) | (bits << 2) | 0b00])
        if restart and i < len(dc_values) - 1:
            entropy += bytes([0xFF, 0xD0 + (i % 8)])
    return out + entropy + b"\xff\xd9"


def test_hand_built_dc_only_fixture_decodes_to_spec_value():
    img = decode_jpeg(_dc_only_jpeg(1, [10]))
    assert img.shape == (8, 8, 1)
    assert (img == 10 * 2 + 128).all()  # dc*16/8 + 128 = 148


def test_hand_built_two_mcu_differential_dc():
    # second block's stored value is a DIFFERENCE from the first
    # predictor (category 4 covers |v| in 8..15): wire diffs [10, -9]
    # -> coefficients [10, 1]
    img = decode_jpeg(_dc_only_jpeg(2, [10, -9]))
    assert img.shape == (8, 16, 1)
    assert (img[:, :8, 0] == 148).all()
    assert (img[:, 8:, 0] == 1 * 2 + 128).all()


def test_hand_built_restart_markers_reset_dc_predictor():
    # with DRI=1 each block restarts: predictors reset, so the wire
    # values ARE the coefficients: [10, -9] -> pixels [148, 110]
    img = decode_jpeg(_dc_only_jpeg(2, [10, -9], restart=True))
    assert (img[:, :8, 0] == 148).all()
    assert (img[:, 8:, 0] == -9 * 2 + 128).all()


def test_encoder_restart_interval_pixels_identical():
    # DRI only re-frames the entropy stream (predictors reset at each
    # RSTn): the quantized coefficients are unchanged, so decoded
    # pixels must equal the no-DRI encode bit-for-bit
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    want = decode_jpeg(encode_jpeg(img, quality=80))
    for ri in (1, 3, 8, 1000):
        p = encode_jpeg(img, quality=80, restart_interval=ri)
        assert np.array_equal(decode_jpeg(p), want), ri
    # the stream really carries the markers: DRI segment + >=1 RSTn
    p = encode_jpeg(img, quality=80, restart_interval=2)
    assert b"\xff\xdd\x00\x04\x00\x02" in p
    assert b"\xff\xd0" in p


def test_encoder_restart_interval_validates_range():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    for bad in (-1, 1 << 16):
        with pytest.raises(ValueError):
            encode_jpeg(img, restart_interval=bad)


def test_constant_image_roundtrip_exact():
    img = np.full((16, 24, 3), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, img)


def test_smooth_gradient_roundtrip_bounded_error():
    yy, xx = np.mgrid[0:33, 0:41]
    img = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert err.max() <= 8 and err.mean() < 1.0


def test_gray_and_odd_dimensions():
    yy, xx = np.mgrid[0:9, 0:13]  # forces MCU edge padding
    gray = ((yy * 11 + xx * 5) % 200).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=95))
    assert out.shape == (9, 13, 1)
    assert np.abs(out[:, :, 0].astype(int) - gray.astype(int)).max() <= 8


def test_chroma_subsampling_420_roundtrip():
    yy, xx = np.mgrid[0:24, 0:20]
    img = np.stack(
        [
            np.clip(yy * 4 + 30, 0, 255),
            np.clip(xx * 5 + 20, 0, 255),
            np.clip(200 - yy * 3, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)  # smooth, no mod-256 wrap edges
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0 and err.max() <= 24  # 2x2 chroma smear bound


def _patched_sof(base: bytes, *, h=None, w=None, nc=None, hv0=None) -> bytes:
    """Return `base` with SOF0 fields overwritten in place (header attack
    surface: every patched field is read before any entropy data)."""
    j = base.find(b"\xff\xc0")
    assert j > 0
    prec, h0, w0, nc0 = struct.unpack_from(">BHHB", base, j + 4)
    head = struct.pack(
        ">BHHB", prec, h if h is not None else h0,
        w if w is not None else w0, nc if nc is not None else nc0,
    )
    out = bytearray(base)
    out[j + 4 : j + 10] = head
    if hv0 is not None:  # comp 0 sampling byte: id, HV, tq
        out[j + 11] = hv0
    return bytes(out)


def test_decoder_rejects_crafted_sof_headers():
    """ADVICE-r5 class (mp4 stsz): SOF h/w/ncomp/sampling are untrusted
    and size allocations BEFORE entropy decode — crafted values must stay
    on the ValueError path (per-row fallback), never MemoryError from a
    65535x65535 claim or ZeroDivisionError from zero sampling factors."""
    from aws_log_ingestion_spark.operators.jpeg import decode_jpeg_batch

    base = encode_jpeg(np.full((8, 8, 3), 90, dtype=np.uint8))
    with pytest.raises(ValueError, match="pixel cap"):
        decode_jpeg(_patched_sof(base, h=65535, w=65535))
    with pytest.raises(ValueError, match="zero dimension"):
        decode_jpeg(_patched_sof(base, h=0))
    with pytest.raises(ValueError, match="component count 2"):
        decode_jpeg(_patched_sof(base, nc=2))
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(_patched_sof(base, hv0=0x00))  # h=v=0: ceil-div by 0
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(_patched_sof(base, hv0=0x5F))  # beyond T.81's 1-4
    # batch isolation: one bomb header among valid payloads degrades to a
    # ValueError in its slot; the rest decode
    bomb = _patched_sof(base, h=65535, w=65535)
    out = decode_jpeg_batch([base, bomb, base])
    assert isinstance(out[1], ValueError) and "pixel cap" in str(out[1])
    assert np.array_equal(out[0], decode_jpeg(base))
    assert np.array_equal(out[2], decode_jpeg(base))


def test_decoder_rejects_progressive_and_junk():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    base = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)  # claim progressive
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    with pytest.raises(ValueError):  # truncated entropy stream
        decode_jpeg(base[:-10])


def test_decoder_rejects_partial_and_noninterleaved_scans():
    """ADVICE r4: legal baseline variants this decoder does not implement
    must raise (-> per-row fallback), never silently decode wrong.

    (a) multi-scan baseline: first SOS covers only Y of a 3-component
    frame — previously decoded to a grayscale Y-plane; (b) Ns==1 scan of
    a component with sampling factors > 1 uses the spec's non-interleaved
    one-block-per-MCU layout, not the interleaved tiling implemented."""
    color = encode_jpeg(np.zeros((16, 16, 3), dtype=np.uint8), subsample=True)
    i = color.find(b"\xff\xda")
    assert i > 0
    # splice an SOS covering ONLY component 1 (Y): Ns=1, tables 0/0
    partial_sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    end = i + 2 + struct.unpack_from(">H", color, i + 2)[0]
    with pytest.raises(ValueError, match="scan does not cover"):
        decode_jpeg(color[:i] + partial_sos + color[end:])
    # (b): shrink SOF to ONE component keeping Y's h=v=2 sampling, then
    # the same Ns=1 scan is non-interleaved per T.81
    j = color.find(b"\xff\xc0")
    sof_len = struct.unpack_from(">H", color, j + 2)[0]
    prec, h, w, _n = struct.unpack_from(">BHHB", color, j + 4)
    sof1 = _seg(0xC0, struct.pack(">BHHB", prec, h, w, 1) + bytes([1, 0x22, 0]))
    gray_hv2 = (
        color[:j] + sof1 + color[j + 2 + sof_len : i] + partial_sos + color[end:]
    )
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(gray_hv2)


def test_decode_media_and_features_route_jpeg(spark):
    from pyspark.sql import functions as F

    img = np.full((8, 16, 3), 0, dtype=np.uint8)
    img[:, :, 0] = 90
    img[:, :, 1] = 90
    img[:, :, 2] = 90  # gray constant -> channel means survive exactly
    payload = encode_jpeg(img, quality=90)
    assert np.array_equal(multimodal.decode_media(payload, "image/jpeg"), img)
    rows = [(0, "image/jpeg", bytearray(payload))]
    media = spark.createDataFrame(rows, ["doc_id", "media_type", "payload"]).select(
        F.col("doc_id").cast("long"), "media_type", F.col("payload").cast("binary")
    )
    got = multimodal.decoded_features(media).collect()[0]
    assert got["decoded"] == 1
    assert got["features"] == [8.0, 16.0, 9000.0, 9000.0]


def test_resize_media_real_jpeg_path(spark):
    from pyspark.sql import functions as F

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack(
        [np.clip(yy * 8, 0, 255), np.clip(xx * 8, 0, 255), np.full((16, 16), 60)],
        axis=-1,
    ).astype(np.uint8)
    payload = encode_jpeg(img, quality=95)
    rows = [(0, "image/jpeg", bytearray(payload), 16, 16, len(payload))]
    media = spark.createDataFrame(
        rows, ["doc_id", "media_type", "payload", "width", "height", "n_bytes"]
    ).select(
        F.col("doc_id").cast("long"),
        "media_type",
        F.col("payload").cast("binary"),
        F.col("width").cast("int"),
        F.col("height").cast("int"),
        F.col("n_bytes").cast("long"),
    )
    got = multimodal.resize_media(media, target_w=8, target_h=8).collect()[0]
    out = decode_jpeg(bytes(got["payload"]))
    assert out.shape == (8, 8, 3)
    # re-encoded lossily: compare against the NN-resample of the decoded
    # source with a tolerance, not byte equality
    src = decode_jpeg(payload)
    expect = multimodal.resize_nn(src, 8, 8)
    assert np.abs(out.astype(int) - expect.astype(int)).max() <= 16
    assert (got["width"], got["height"]) == (8, 8)
