"""Real media decode: pure-Python BMP/WAV parsers against fixtures built
independently (struct-packed here, byte by byte, per the public format
specs) — known pixel/sample values must round-trip exactly, and the
decoded_features operator must run them through Spark's mapInPandas with
the fallback path isolating undecodable payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators import multimodal


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (independent of the decoder):
    pixels is (H, W, 3) uint8 RGB; rows written bottom-up, BGR, padded
    to 4 bytes."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = pixels[y, x]
            row += bytes([b, g, r])
        row += b"\x00" * (stride - len(row))
        body += row
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + dib + body)


def encode_wav(samples: np.ndarray, rate: int = 8000, bits: int = 16) -> bytes:
    """Minimal RIFF/WAVE PCM writer: samples is (n_frames, channels)."""
    n_frames, ch = samples.shape
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        data = (samples + 128).astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_bmp_roundtrip_exact_pixels():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd width -> padding
    out = multimodal.decode_bmp(encode_bmp(px))
    assert out.shape == (5, 7, 3)
    assert np.array_equal(out, px)


def test_bmp_rejects_non_bmp_and_truncated():
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"not a bitmap at all........................................")
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        multimodal.decode_bmp(encode_bmp(px)[:-8])


def test_wav_roundtrip_exact_samples_16_and_8_bit():
    rng = np.random.default_rng(4)
    stereo = rng.integers(-30000, 30000, size=(11, 2), dtype=np.int64)
    got, rate = multimodal.decode_wav(encode_wav(stereo, rate=16000, bits=16))
    assert rate == 16000 and got.shape == (11, 2)
    assert np.array_equal(got, stereo)
    mono = rng.integers(-128, 128, size=(9, 1), dtype=np.int64)
    got8, rate8 = multimodal.decode_wav(encode_wav(mono, rate=8000, bits=8))
    assert rate8 == 8000
    assert np.array_equal(got8, mono)


def test_decode_media_dispatch():
    px = np.full((2, 2, 3), 9, dtype=np.uint8)
    assert multimodal.decode_media(encode_bmp(px), "image/bmp").shape == (2, 2, 3)
    s = np.zeros((4, 1), dtype=np.int64)
    assert multimodal.decode_media(encode_wav(s), "audio/wav")[1] == 8000
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG....", "image/png")


def test_decoded_features_through_spark(spark):
    """End-to-end through mapInPandas: real BMP/WAV rows decode (with
    exact known features), a png row falls back to byte-slice features
    with decoded=0 instead of failing the partition."""
    px = np.zeros((3, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # R plane constant -> mean_R*100 == 20000
    px[:, :, 1] = 7
    bmp = encode_bmp(px)
    wav = encode_wav(np.full((6, 2), -3, dtype=np.int64), rate=22050, bits=16)
    rows = [
        (0, "image/bmp", bytearray(bmp)),
        (1, "audio/wav", bytearray(wav)),
        (2, "image/png", bytearray(b"\x89PNG fake compressed payload")),
    ]
    media = spark.createDataFrame(rows, ["doc_id", "media_type", "payload"]).select(
        F.col("doc_id").cast("long"), "media_type", F.col("payload").cast("binary")
    )
    got = {r["doc_id"]: r for r in multimodal.decoded_features(media).collect()}
    assert got[0]["decoded"] == 1
    assert got[0]["features"] == [3.0, 4.0, 20000.0, 700.0]
    assert got[1]["decoded"] == 1
    assert got[1]["features"] == [6.0, 22050.0, 2.0, 300.0]
    assert got[2]["decoded"] == 0
    assert len(got[2]["features"]) == 4  # fake byte-slice fallback ran
