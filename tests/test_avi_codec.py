"""MJPEG-AVI codec tests: RIFF round trips, DC-exact frames, malformed
isolation, and the Spark-side video operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators import multimodal
from aws_log_ingestion_spark.operators.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def test_dc_exact_constant_frames_round_trip_bit_exact():
    """Even constant-gray frames survive the lossy codec exactly (same
    DC-quantizer argument as the JPEG codec tests)."""
    vals = [54, 100, 200, 0, 252]
    frames = [np.full((6, 9, 3), v, dtype=np.uint8) for v in vals]
    out, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=12, quality=50))
    assert fps == 12
    assert len(out) == len(frames)
    for o, v in zip(out, vals):
        assert o.shape == (6, 9, 3)
        assert (o == v).all()


def test_noisy_frames_round_trip_bounded_error():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (16, 24, 3)).astype(np.uint8) for _ in range(3)]
    out, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=5, quality=90))
    for o, f in zip(out, frames):
        assert o.shape == f.shape
        # random noise is the worst case for a DCT codec; bound loosely
        assert np.abs(o.astype(int) - f.astype(int)).mean() < 16


def test_malformed_payloads_raise_value_error():
    good = encode_avi_mjpeg([np.full((4, 4, 3), 10, np.uint8)], fps=1)
    for bad in (b"", b"RIFF\x04\x00\x00\x00AVI ", good[:32], b"junk" * 50):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)
    # non-MJPG stream handler is refused, not mis-decoded
    tampered = good.replace(b"MJPG", b"H264")
    with pytest.raises(ValueError):
        decode_avi_mjpeg(tampered)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], fps=1)
    with pytest.raises(ValueError):
        encode_avi_mjpeg(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)], fps=1
        )


def test_video_frame_features_through_spark(spark):
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_decodable_media(docs)
    rows = multimodal.video_frame_features(media).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    expected_docs = [d for d in range(30) if d % 6 == 4]
    assert sorted({k[0] for k in got}) == expected_docs
    for d in expected_docs:
        n = d % 4 + 2
        w, h = d % 5 + 3, (d // 2) % 3 + 2
        for i in range(n):
            r = got[(d, i)]
            assert (r["height"], r["width"]) == (h, w)
            assert r["mean_x100"] == ((d * 9 + i * 31) % 127) * 2 * 100


def test_resize_media_real_video_path_through_spark(spark):
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_decodable_media(docs).withColumn(
        "width", F.lit(0)
    ).withColumn("height", F.lit(0)).withColumn(
        "n_bytes", F.length("payload").cast("long")
    )
    out = multimodal.resize_media(media, target_w=8, target_h=8)
    for r in out.filter(F.col("media_type") == "video/avi").collect():
        d = r["doc_id"]
        frames, fps = decode_avi_mjpeg(bytes(r["payload"]))
        assert fps == d % 5 + 5
        assert len(frames) == d % 4 + 2
        for i, f in enumerate(frames):
            assert f.shape == (8, 8, 3)
            # constant frames stay exactly constant through resize+re-encode
            assert (f == ((d * 9 + i * 31) % 127) * 2).all()
