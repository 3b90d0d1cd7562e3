"""Real media decode: pure-Python BMP/WAV/PNG parsers against fixtures built
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
    gx = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert multimodal.decode_media(
        multimodal.encode_png(gx), "image/png"
    ).shape == (2, 2, 3)
    with pytest.raises(ValueError):  # bad signature -> fallback isolation
        multimodal.decode_media(b"\x89PNG....", "image/png")
    # mp4 now dispatches to the real ISO-BMFF demuxer: Motion-JPEG
    # tracks decode, inter-frame codecs stay honestly NotImplemented,
    # structureless bytes are malformed (fallback isolation)
    from aws_log_ingestion_spark.operators.mp4 import encode_mp4_mjpeg
    from aws_log_ingestion_spark.operators.probe import encode_mp4_stub

    frames, fps = multimodal.decode_media(
        encode_mp4_mjpeg([np.full((2, 2, 3), 8, np.uint8)], fps=6), "video/mp4"
    )
    assert fps == 6 and (frames[0] == 8).all()
    with pytest.raises(NotImplementedError):  # h264 genuinely needs ffmpeg
        multimodal.decode_media(encode_mp4_stub(8, 8, 100, b"avc1"), "video/mp4")
    with pytest.raises(ValueError):
        multimodal.decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")
    with pytest.raises(NotImplementedError):  # genuinely codec-less type
        multimodal.decode_media(b"anything", "application/octet-stream")


def test_decoded_features_through_spark(spark):
    """End-to-end through mapInPandas: real BMP/WAV rows decode (with
    exact known features), a CORRUPT png row falls back to byte-slice
    features with decoded=0 instead of failing the partition."""
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


def test_package_encode_bmp_matches_independent_writer():
    """The package's vectorized encode_bmp must emit byte-identical BMPs
    to this file's independent per-pixel writer, and round-trip through
    decode_bmp exactly."""
    rng = np.random.default_rng(11)
    for shape in [(5, 7, 3), (1, 1, 3), (8, 4, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = multimodal.encode_bmp(px)
        assert enc == encode_bmp(px)
        assert np.array_equal(multimodal.decode_bmp(enc), px)


def test_resize_nn_matches_loop_oracle():
    """Integer nearest-neighbor sampling vs an explicit per-pixel loop."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    tw, th = 4, 7
    got = multimodal.resize_nn(img, tw, th)
    assert got.shape == (th, tw, 3)
    for r in range(th):
        for c in range(tw):
            assert np.array_equal(got[r, c], img[(r * 10) // th, (c * 6) // tw])


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png_filtered(pixels: np.ndarray, filters, palette: bytes | None = None) -> bytes:
    """Independent PNG writer (per the public spec, no shared code with
    the package decoder): forward-filters row y with filters[y % len]
    using plain per-pixel integer arithmetic, then zlib-compresses one
    IDAT. ``palette`` switches to color type 3 (pixels = (H, W) indices).
    Exercises every filter type the decoder must invert."""
    import zlib

    if palette is not None:
        h, w = pixels.shape
        c, ctype = 1, 3
        flat = pixels.reshape(h, w).astype(np.int64)
    else:
        h, w, c = pixels.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        flat = pixels.reshape(h, w * c).astype(np.int64)
    stride, bpp = w * c, c
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        out = bytearray([f])
        for x in range(stride):
            a = int(row[x - bpp]) if x >= bpp else 0  # left (original)
            b = int(prev[x])  # up (original)
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                cc = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - cc
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            out.append((int(row[x]) - pred) % 256)
        raw += out
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _png_chunk(b"PLTE", palette)
    import zlib as _z

    return body + _png_chunk(b"IDAT", _z.compress(bytes(raw), 9)) + _png_chunk(b"IEND", b"")


def test_png_roundtrip_all_color_types():
    """Package encode_png -> decode_png must be identity for gray,
    gray+alpha, RGB and RGBA."""
    rng = np.random.default_rng(21)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(6, 5, c), dtype=np.uint8)
        out = multimodal.decode_png(multimodal.encode_png(px))
        assert out.shape == (6, 5, c)
        assert np.array_equal(out, px)
    gray2d = rng.integers(0, 256, size=(4, 9), dtype=np.uint8)  # 2-D input
    assert np.array_equal(
        multimodal.decode_png(multimodal.encode_png(gray2d))[:, :, 0], gray2d
    )


def test_png_decoder_inverts_every_filter_type():
    """Decode PNGs written by the INDEPENDENT writer with each filter
    type on its own and all five interleaved — the unfilter math (Sub
    cumsum, Up row-add, Average/Paeth pixel loops) must reconstruct the
    original pixels exactly."""
    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = multimodal.decode_png(encode_png_filtered(px, filters))
        assert np.array_equal(got, px), f"filters={filters}"
    rgba = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    assert np.array_equal(
        multimodal.decode_png(encode_png_filtered(rgba, [4, 3, 1, 2])), rgba
    )


def test_png_palette_expands_to_rgb():
    palette = bytes(range(48))  # 16 entries of (r, g, b)
    idx = np.array([[0, 3, 15], [7, 7, 1]], dtype=np.uint8)
    got = multimodal.decode_png(encode_png_filtered(idx, [0, 2], palette=palette))
    expect = np.frombuffer(palette, dtype=np.uint8).reshape(16, 3)[idx]
    assert got.shape == (2, 3, 3)
    assert np.array_equal(got, expect)


def test_png_rejects_unsupported_and_corrupt():
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    good = multimodal.encode_png(px)
    with pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNG\r\n\x1a\nnot chunks")
    with pytest.raises(ValueError):  # corrupt deflate stream
        multimodal.decode_png(good[:-20] + b"\x00" * 20)
    depth16 = bytearray(encode_png_filtered(px, [0]))
    depth16[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(depth16))


def test_resize_media_real_bmp_path_through_spark(spark):
    """resize_media must do a TRUE pixel resize for image/bmp AND
    image/png (decode -> NN sample -> re-encode; output decodes to
    target dims with pixels equal to the numpy oracle) while corrupt or
    codec-less payloads keep the deterministic byte-downsample
    fallback."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    bmp = encode_bmp(px)
    png_px = rng.integers(0, 256, size=(8, 10, 4), dtype=np.uint8)  # RGBA
    png = multimodal.encode_png(png_px)
    png_payload = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8))
    rows = [
        (0, "image/bmp", bytearray(bmp), 11, 9, len(bmp)),
        (1, "image/png", bytearray(png_payload), 64, 64, len(png_payload)),
        (2, "image/png", bytearray(png), 10, 8, len(png)),
    ]
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
    tw, th = 4, 3
    got = {
        r["doc_id"]: r
        for r in multimodal.resize_media(media, target_w=tw, target_h=th).collect()
    }
    # BMP: true pixel resize — decode the output payload and compare to
    # the numpy nearest-neighbor oracle
    out_img = multimodal.decode_bmp(bytes(got[0]["payload"]))
    assert out_img.shape == (th, tw, 3)
    rr = (np.arange(th) * 9) // th
    cc = (np.arange(tw) * 11) // tw
    assert np.array_equal(out_img, px[rr][:, cc])
    assert (got[0]["width"], got[0]["height"]) == (tw, th)
    # corrupt png: unchanged byte-downsample contract
    ratio = max(1, int((64 * 64) / (tw * th)))
    assert bytes(got[1]["payload"]) == png_payload[::ratio]
    assert got[1]["n_bytes"] == len(png_payload[::ratio])
    # real png: true pixel resize, alpha channel preserved
    out_png = multimodal.decode_png(bytes(got[2]["payload"]))
    assert out_png.shape == (th, tw, 4)
    rr = (np.arange(th) * 8) // th
    cc = (np.arange(tw) * 10) // tw
    assert np.array_equal(out_png, png_px[rr][:, cc])


def test_package_encode_wav_matches_independent_writer():
    rng = np.random.default_rng(14)
    s16 = rng.integers(-30000, 30000, size=(13, 2), dtype=np.int64)
    assert multimodal.encode_wav(s16, rate=16000, bits=16) == encode_wav(
        s16, rate=16000, bits=16
    )
    got, rate = multimodal.decode_wav(multimodal.encode_wav(s16, rate=16000))
    assert rate == 16000 and np.array_equal(got, s16)


def test_synth_decodable_media_round_trips(spark):
    """Every synthesized payload must really decode (decoded=1) with the
    closed-form features the oracle computes — spot-check one doc of each
    format against hand arithmetic."""
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_decodable_media(docs)
    mts = {r["doc_id"]: r["media_type"] for r in media.collect()}
    assert [mts[d] for d in range(8)] == [
        "image/bmp", "audio/wav", "image/png", "image/jpeg",
        "video/avi", "image/png", "image/bmp", "audio/wav",
    ]
    out = {r["doc_id"]: r for r in multimodal.decoded_features(media).collect()}
    assert all(out[d]["decoded"] == 1 for d in range(12))
    # doc_id=6 (bmp): w=6%7+2=8, h=6%5+2=3, pixel(r,c,k)=(42+5r+3c+11k)%256
    sr = sum((42 + 5 * r + 3 * c) % 256 for r in range(3) for c in range(8))
    sg = sum((42 + 5 * r + 3 * c + 11) % 256 for r in range(3) for c in range(8))
    assert out[6]["features"] == [3.0, 8.0, float(sr * 100 // 24), float(sg * 100 // 24)]
    # doc_id=3 (jpeg, DC-exact constant gray): v=((27)%127)*2=54,
    # w=3%5+3=6, h=3%3+2=2 — the LOSSY codec decodes to exactly v
    assert out[3]["features"] == [2.0, 6.0, 5400.0, 5400.0]
    # doc_id=9 (jpeg): v=((81)%127)*2=162, w=9%5+3=7, h=9%3+2=2
    assert out[9]["features"] == [2.0, 7.0, 16200.0, 16200.0]
    # doc_id=7 (wav): ch=(7//2)%2+1=2, n=7%50+10=17, rate=8000+(7%4)*4000=20000
    sa = sum(abs((91 + 7 * i) % 4096 - 2048) for i in range(34))
    assert out[7]["features"] == [17.0, 20000.0, 2.0, float(sa * 100 // 34)]
    # doc_id=4 (MJPEG avi, DC-exact frames): n=4%4+2=2, w=4%5+3=7,
    # h=(4//2)%3+2=4, v_i=((36+31i)%127)*2 -> [72, 134]
    assert out[4]["features"] == [2.0, 4.0, 7.0, float((72 + 134) * 100 // 2)]
    # doc_id=2 (png RGB): w=2%6+2=4, h=2%4+2=4, pixel(r,c,k)=(22+3r+7c+5k)%256
    s0 = sum((22 + 3 * r + 7 * c) % 256 for r in range(4) for c in range(4))
    s1 = sum((22 + 3 * r + 7 * c + 5) % 256 for r in range(4) for c in range(4))
    assert out[2]["features"] == [4.0, 4.0, float(s0 * 100 // 16), float(s1 * 100 // 16)]
    # doc_id=5 (png RGBA: (5//3)%2==1): same feature formula, channels 0/1
    s0 = sum((55 + 3 * r + 7 * c) % 256 for r in range(3) for c in range(7))
    s1 = sum((55 + 3 * r + 7 * c + 5) % 256 for r in range(3) for c in range(7))
    assert out[5]["features"] == [3.0, 7.0, float(s0 * 100 // 21), float(s1 * 100 // 21)]


def test_audio_energy_windows_stereo_fold_and_ragged_tail(spark):
    """Stereo channel averaging uses FLOOR (numpy // semantics, matters
    for negative sums) and the last window keeps its short length."""
    import numpy as np

    from pyspark.sql import Row

    # 2-channel, 20 frames: window 16 -> windows of 16 and 4
    s = np.array(
        [[(13 * i) % 4096 - 2048 for _ in range(1)] + [(7 * i) % 4096 - 2048]
         for i in range(20)],
        dtype=np.int64,
    )
    payload = multimodal.encode_wav(s, rate=8000)
    media = spark.createDataFrame(
        [Row(doc_id=1, media_type="audio/wav", payload=bytearray(payload)),
         Row(doc_id=2, media_type="video/mp4", payload=bytearray(b"\x00" * 64))]
    )
    rows = {r["win_idx"]: r for r in
            multimodal.audio_energy_windows(media, win=16).collect()}
    assert sorted(rows) == [0, 1]  # the mp4 row is dropped, not failed
    mono = (s[:, 0] + s[:, 1]) // 2  # floor division, negative-safe
    for wi, seg in ((0, mono[:16]), (1, mono[16:])):
        assert rows[wi]["n_samples"] == len(seg)
        assert rows[wi]["mean_abs_x100"] == int(np.abs(seg).sum()) * 100 // len(seg)
        assert rows[wi]["sum_sq"] == int((seg * seg).sum())


def test_audio_resample_stride_and_reencode_exact(spark):
    """Decimation keeps frames 0,2,4,... across ALL channels, and the
    re-encode/re-decode loop is sample-exact (16-bit PCM round trip)."""
    import numpy as np
    from pyspark.sql import Row

    s = np.array([[i * 100 - 800, -i * 50] for i in range(9)], dtype=np.int64)
    payload = multimodal.encode_wav(s, rate=16000)
    media = spark.createDataFrame(
        [Row(doc_id=5, media_type="audio/wav", payload=bytearray(payload))]
    )
    r = multimodal.audio_resample(media, factor=2).collect()[0]
    kept = s[::2]
    assert r["rate_out"] == 8000
    assert (r["n_frames_out"], r["n_channels"]) == (5, 2)
    assert r["sum_s"] == int(kept.sum())
    assert r["sum_abs"] == int(np.abs(kept).sum())
