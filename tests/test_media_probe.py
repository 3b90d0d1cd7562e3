"""Container-probe tests: every real encoder's output must probe back to
its exact header fields; malformed bytes degrade, never crash."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators import multimodal
from aws_log_ingestion_spark.operators.avi import encode_avi_mjpeg
from aws_log_ingestion_spark.operators.jpeg import encode_jpeg
from aws_log_ingestion_spark.operators.probe import (
    encode_mp4_stub,
    probe_media,
)


def test_probe_all_encoders_round_trip():
    img = np.full((4, 7, 3), 20, np.uint8)
    assert probe_media(multimodal.encode_bmp(img)) == ("bmp", "rgb24", 7, 4, None)
    assert probe_media(multimodal.encode_png(img)) == ("png", "rgb8", 7, 4, None)
    rgba = np.full((3, 5, 4), 9, np.uint8)
    assert probe_media(multimodal.encode_png(rgba)) == ("png", "rgba8", 5, 3, None)
    assert probe_media(encode_jpeg(img, quality=50)) == ("jpeg", "baseline", 7, 4, None)
    s = np.zeros((25, 2), dtype=np.int64)
    assert probe_media(multimodal.encode_wav(s, rate=16000)) == (
        "riff-wave", "pcm16", None, None, 25 * 1000 // 16000,
    )
    avi = encode_avi_mjpeg([img] * 3, fps=10)
    # duration = frames * usec_per_frame // 1000
    assert probe_media(avi) == ("riff-avi", "mjpg", 7, 4, 3 * (1_000_000 // 10) // 1000)
    assert probe_media(encode_mp4_stub(640, 360, 5500)) == ("mp4", "avc1", 640, 360, 5500)
    assert probe_media(encode_mp4_stub(1920, 1080, 7, codec=b"hvc1")) == (
        "mp4", "hvc1", 1920, 1080, 7,
    )


def test_probe_rejects_unknown_and_truncated():
    for bad in (b"", b"garbage" * 10, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4):
        with pytest.raises(ValueError):
            probe_media(bad)
    # truncated mp4: valid ftyp then a box that overruns
    trunc = encode_mp4_stub(64, 64, 100)[:40]
    with pytest.raises(ValueError):
        probe_media(trunc)


def test_probe_sniffer_crash_does_not_mask_later_sniffers():
    """ADVICE r4: RIFF magic serves both WAV and AVI and _probe_wav runs
    first — if a payload makes an earlier sniffer blow up with
    struct.error/IndexError past its magic check, later sniffers must
    still get their turn (here: a real AVI must probe as AVI even though
    the WAV sniffer choked on the shared RIFF prefix)."""
    from aws_log_ingestion_spark.operators.avi import encode_avi_mjpeg
    import numpy as np

    img = np.arange(7 * 4 * 3, dtype=np.uint8).reshape(4, 7, 3)
    avi = encode_avi_mjpeg([img, img], fps=10)
    assert probe_media(avi)[0] == "riff-avi"
    # and a truncated RIFF that defeats every sniffer reports the generic
    # unknown-container error, not one sniffer's internal crash
    with pytest.raises(ValueError, match="unknown media container"):
        probe_media(b"RIFF\x10\x00\x00\x00")


def test_mp4_64bit_largesize_and_v1_boxes():
    """Box walk must honor largesize=1 + 64-bit length, and v1 mvhd/tkhd
    layouts (8-byte times) — hand-built here, independent of the stub."""

    def box64(typ, body):
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(body)) + body

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 90000)  # timescale
        + struct.pack(">Q", 90000 * 3)  # duration: 3 s
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQI4x", 0, 0, 1)
        + struct.pack(">Q", 0)
        + b"\x00" * 52
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + struct.pack(">I", 16) + b"mp4v" + b"\x00" * 8)
    moov = box64(
        b"moov",
        mvhd + box(b"trak", tkhd + box(b"mdia", box(b"minf", box(b"stbl", stsd)))),
    )
    payload = box(b"ftyp", b"isom" + b"\x00" * 8) + moov
    assert probe_media(payload) == ("mp4", "mp4v", 320, 240, 3000)


def test_media_probe_through_spark(spark):
    docs = spark.range(0, 36).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_probe_media(docs)
    rows = {r["doc_id"]: r for r in multimodal.media_probe(media).collect()}
    assert len(rows) == 36
    # one spot check per arm
    assert (rows[0]["container"], rows[0]["codec"]) == ("bmp", "rgb24")
    assert rows[7]["container"] == "riff-wave" and rows[7]["duration_ms"] == 17 * 1000 // 20000
    # every doc_id%6==2 has even doc_id//3, so probe-visible PNGs are rgb8
    assert rows[8]["codec"] == "rgb8" and rows[14]["codec"] == "rgb8"
    assert (rows[11]["container"], rows[11]["codec"]) == ("mp4", "hvc1")
    assert rows[9]["container"] == "jpeg"
    assert rows[10]["container"] == "riff-avi"
    r = rows[17]  # 17 % 6 == 5 -> mp4; (17//6)%2 == 0 -> avc1
    assert (r["container"], r["codec"]) == ("mp4", "avc1")
    assert (r["width"], r["height"]) == ((17 % 16 + 1) * 16, (17 % 9 + 1) * 16)
    assert r["duration_ms"] == 17 % 9000 + 1000
    # corrupt payload degrades to 'unknown', not a partition failure
    from pyspark.sql import Row

    junk = spark.createDataFrame(
        [Row(doc_id=99, media_type="video/mp4", payload=bytearray(b"nope" * 8))]
    )
    out = multimodal.media_probe(junk).collect()[0]
    assert out["container"] == "unknown" and out["codec"] is None
