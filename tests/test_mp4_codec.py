"""Motion-JPEG MP4 codec tests: ISO-BMFF round trips, sample-table
reconstruction, inter-frame refusal, malformed isolation, and the
Spark-side video operators over the mp4 fixture generator."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators import multimodal
from aws_log_ingestion_spark.operators.mp4 import (
    _sample_extents,
    decode_mp4_mjpeg,
    encode_mp4_mjpeg,
)
from aws_log_ingestion_spark.operators.probe import encode_mp4_stub, probe_media


def test_dc_exact_constant_frames_round_trip_bit_exact():
    vals = [54, 100, 200, 0, 252]
    frames = [np.full((6, 9, 3), v, dtype=np.uint8) for v in vals]
    out, fps = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, fps=12, quality=50))
    assert fps == 12
    assert len(out) == len(frames)
    for o, v in zip(out, vals):
        assert o.shape == (6, 9, 3)
        assert (o == v).all()


def test_noisy_frames_round_trip_bounded_error():
    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (16, 24, 3)).astype(np.uint8) for _ in range(3)]
    out, _ = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, fps=5, quality=90))
    for o, f in zip(out, frames):
        assert o.shape == f.shape
        assert np.abs(o.astype(int) - f.astype(int)).mean() < 16


def test_probe_reports_mjpeg_mp4_metadata():
    frames = [np.full((4, 5, 3), 10, np.uint8)] * 3
    container, codec, w, h, dur = probe_media(encode_mp4_mjpeg(frames, fps=8))
    assert (container, codec, w, h) == ("mp4", "jpeg", 5, 4)
    assert dur == 3 * 1000 // 8


def test_sample_extents_multi_chunk_and_run():
    """stsc runs spanning several chunks reconstruct the standard way:
    run 1 covers chunks 1-2 at 2 samples each, run 2 covers chunk 3 at
    1 sample; offsets advance by cumulative sizes within each chunk."""
    sizes = [10, 20, 30, 40, 50]
    offsets = [100, 200, 300]
    runs = [(1, 2, 1), (3, 1, 1)]
    assert _sample_extents(sizes, offsets, runs) == [
        (100, 10),
        (110, 20),
        (200, 30),
        (230, 40),
        (300, 50),
    ]


def test_fragmented_mp4_round_trip_and_equivalence():
    """fMP4 (moof/tfhd/trun, default-base-is-moof) decodes to exactly
    the same frames/fps as the flat layout, at every fragment size
    including 1 (one sample per fragment) and >n (single fragment)."""
    vals = [10, 64, 250, 8, 120]
    frames = [np.full((4, 5, 3), v, dtype=np.uint8) for v in vals]
    flat, flat_fps = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, fps=8))
    for fs in (1, 2, 3, 99):
        out, fps = decode_mp4_mjpeg(
            encode_mp4_mjpeg(frames, fps=8, fragment_size=fs)
        )
        assert fps == flat_fps == 8
        assert len(out) == len(flat) == 5
        for o, f in zip(out, flat):
            assert (o == f).all()
    # a fragmented payload still probes as mp4/jpeg with real dims
    frag = encode_mp4_mjpeg(frames, fps=8, fragment_size=2)
    assert probe_media(frag)[:4] == ("mp4", "jpeg", 5, 4)
    # truncating the last fragment is malformed, never silently short
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(frag[: len(frag) - 10])
    with pytest.raises(ValueError):
        encode_mp4_mjpeg(frames, fps=8, fragment_size=0)


def test_fragmented_mp4_trex_defaults_only():
    """A legal fMP4 may omit sizes/durations from BOTH trun and tfhd
    and rely on the movie-level mvex/trex defaults (ISO 14496-12
    §8.8.3). Hand-build such a fragment (identical constant frames ->
    identical JPEG sizes, so one trex default_sample_size is exact)."""
    from aws_log_ingestion_spark.operators.jpeg import encode_jpeg
    from aws_log_ingestion_spark.operators.mp4 import _box, _full

    frames = [np.full((4, 4, 3), 10, np.uint8)] * 3
    frag = encode_mp4_mjpeg(frames, fps=5, fragment_size=3)
    s = len(encode_jpeg(frames[0], quality=50))

    i = frag.index(b"moof") - 4
    head, tail = frag[:i], frag[i:]
    mdat = tail[tail.index(b"mdat") - 4 :]
    # moof whose tfhd carries ONLY default-base-is-moof and whose trun
    # carries ONLY data_offset — sizes/duration must come from trex
    mfhd = _full(b"mfhd", struct.pack(">I", 1))
    tfhd = _full(b"tfhd", struct.pack(">I", 1), flags=0x020000)
    moof_size = 8 + len(mfhd) + (8 + len(tfhd) + 20)
    trun = _full(b"trun", struct.pack(">Ii", 3, moof_size + 8), flags=0x1)
    moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
    assert len(moof) == moof_size
    # patch trex: default duration 1 tick, default sample size s
    k = head.index(b"trex")
    head = head[: k + 8] + struct.pack(">5I", 1, 1, 1, s, 0) + head[k + 28 :]

    out, fps = decode_mp4_mjpeg(head + moof + mdat)
    assert fps == 5
    assert len(out) == 3
    for o in out:
        assert (o == 10).all()
    # and with NO size anywhere (trex size 0) the decode fails closed
    bad = head[: k + 8] + struct.pack(">5I", 1, 1, 1, 0, 0) + head[k + 28 :]
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(bad + moof + mdat)


def test_interframe_codec_raises_not_implemented():
    for codec in (b"avc1", b"hvc1", b"mp4v", b"av01"):
        with pytest.raises(NotImplementedError):
            decode_mp4_mjpeg(encode_mp4_stub(64, 48, 5000, codec=codec))


def test_malformed_payloads_raise_value_error():
    good = encode_mp4_mjpeg([np.full((4, 4, 3), 10, np.uint8)], fps=1)
    for bad in (b"", b"\x00\x00\x00\x08ftyp", good[: len(good) // 2], b"junk" * 50):
        with pytest.raises(ValueError):
            decode_mp4_mjpeg(bad)
    # a sample extent pointing past the container is refused, not read
    i = good.find(b"stco")
    (first_off,) = struct.unpack_from(">I", good, i + 12)
    tampered = (
        good[: i + 12] + struct.pack(">I", len(good) - 2) + good[i + 16 :]
    )
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(tampered)
    assert first_off < len(good)


def test_crafted_stsz_uniform_count_raises_value_error():
    """ADVICE r5: a crafted uniform-size stsz with cnt=0xFFFFFFFF must
    fail as ValueError (the per-row isolation contract), not attempt a
    ~34 GB list allocation that dies as MemoryError."""
    good = encode_mp4_mjpeg([np.full((4, 4, 3), 10, np.uint8)] * 2, fps=1)
    i = good.find(b"stsz")
    tampered = (
        good[: i + 8]
        + struct.pack(">II", 1000, 0xFFFFFFFF)
        + good[i + 16 :]
    )
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(tampered)


def test_malformed_stsc_run_ordering_raises_value_error():
    """ADVICE r5: first_chunk=0 (or non-increasing runs) must raise, not
    silently alias offsets[-1] via a range starting at -1."""
    with pytest.raises(ValueError):
        _sample_extents([10, 20], [100, 200], [(0, 1, 1)])
    with pytest.raises(ValueError):
        _sample_extents([10, 20, 30], [100, 200, 300], [(2, 1, 1), (2, 1, 1)])
    # tampered container: patch the first stsc run's first_chunk to 0
    good = encode_mp4_mjpeg([np.full((4, 4, 3), 10, np.uint8)] * 3, fps=1)
    i = good.find(b"stsc")
    tampered = good[: i + 12] + struct.pack(">I", 0) + good[i + 16 :]
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(tampered)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_mp4_mjpeg([], fps=1)
    with pytest.raises(ValueError):
        encode_mp4_mjpeg(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)], fps=1
        )
    with pytest.raises(ValueError):
        encode_mp4_mjpeg([np.zeros((4, 4, 3), np.uint8)], fps=0)


def test_video_frame_features_covers_both_containers(spark):
    """The driver-gate shape: AVI (doc_id%6==4) and MP4 (doc_id%6==2)
    payloads union into one frame-feature scan, each matching its own
    closed form."""
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_decodable_media(docs).unionByName(
        multimodal.synth_mp4_media(docs)
    )
    rows = multimodal.video_frame_features(media).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    avi_docs = [d for d in range(30) if d % 6 == 4]
    mp4_docs = [d for d in range(30) if d % 6 == 2]
    assert sorted({k[0] for k in got}) == sorted(avi_docs + mp4_docs)
    for d in avi_docs:
        for i in range(d % 4 + 2):
            r = got[(d, i)]
            assert (r["height"], r["width"]) == ((d // 2) % 3 + 2, d % 5 + 3)
            assert r["mean_x100"] == ((d * 9 + i * 31) % 127) * 2 * 100
    for d in mp4_docs:
        n = (d // 6) % 4 + 2
        for i in range(n):
            r = got[(d, i)]
            assert (r["height"], r["width"]) == ((d // 6) % 3 + 2, d % 5 + 3)
            assert r["mean_x100"] == ((d * 5 + i * 29) % 127) * 2 * 100
        assert (d, n) not in got


def test_decoded_features_and_resize_take_the_mp4_path(spark):
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_mp4_media(docs)
    feats = {
        r["doc_id"]: r
        for r in multimodal.decoded_features(media).collect()
    }
    for d in range(2, 30, 6):
        n = (d // 6) % 4 + 2
        w, h = d % 5 + 3, (d // 6) % 3 + 2
        mean = sum(((d * 5 + i * 29) % 127) * 2 for i in range(n)) * 100 // n
        r = feats[d]
        assert r["decoded"] == 1
        assert r["features"] == [float(n), float(h), float(w), float(mean)]

    sized = multimodal.resize_media(
        media.withColumn("width", F.lit(0))
        .withColumn("height", F.lit(0))
        .withColumn("n_bytes", F.length("payload").cast("long")),
        target_w=8,
        target_h=8,
    )
    for r in sized.collect():
        d = r["doc_id"]
        frames, fps = decode_mp4_mjpeg(bytes(r["payload"]))
        assert fps == d % 4 + 4
        assert len(frames) == (d // 6) % 4 + 2
        for i, f in enumerate(frames):
            assert f.shape == (8, 8, 3)
            assert (f == ((d * 5 + i * 29) % 127) * 2).all()
