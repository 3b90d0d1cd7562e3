"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched ``mapInPandas``. Decode
is REAL for the two uncompressed container formats a pure-Python parser
can handle — BMP (24-bit BI_RGB) and WAV (8/16-bit integer PCM), see
``decode_bmp``/``decode_wav`` — while compressed formats (png/jpeg/mp4)
still raise NotImplementedError because their codecs (PIL/ffmpeg) are
not in this container; the deterministic fake extractor stands in for
those. The Spark-side plumbing (schema, batch iteration, partitioning,
UDF signatures) is identical either way, which is the part that matters
for the 100 TB design: binary columns stream through Arrow without
driver materialisation, and the extractor is a per-batch generator so
one oversized payload can't OOM a whole partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents: payload = utf-8
    text bytes (stands in for an encoded image), metadata derived from
    content. Real pipelines read payloads from object storage with
    ``binaryFile`` format — same schema."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_bmp(payload: bytes):
    """Real decode of an uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB) — pure struct+numpy, no codec library. Returns an (H, W, 3)
    uint8 RGB array. Raises ValueError on anything that isn't a plain
    24-bit uncompressed BMP (rare in practice for training corpora of
    raw screenshots; compressed formats still need a codec)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={compression}")
    top_down = height < 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + row_stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=pixel_off
    ).reshape(height, row_stride)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def decode_wav(payload: bytes):
    """Real decode of a RIFF/WAVE PCM payload (8- or 16-bit integer PCM)
    — pure struct+numpy chunk walk. Returns (samples[n, channels] int32,
    sample_rate). Raises ValueError for non-PCM or exotic widths."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or n_channels < 1:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    else:  # 8-bit WAV is unsigned, centred at 128
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    n_frames = len(raw) // n_channels
    return raw[: n_frames * n_channels].astype(np.int32).reshape(
        n_frames, n_channels
    ), sample_rate


def decode_media(payload: bytes, media_type: str):
    """Codec dispatch. REAL for the two uncompressed container formats a
    pure-Python parser can handle (image/bmp -> (H, W, 3) uint8 RGB;
    audio/wav -> (samples[n, ch] int32, rate)); compressed formats (png/
    jpeg/mp4...) still raise NotImplementedError — those genuinely need
    codec libraries this container doesn't ship (PIL / ffmpeg)."""
    if media_type == "image/bmp":
        return decode_bmp(payload)
    if media_type == "audio/wav":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "bmp/wav decode is real, others use fake_features()"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, n_features: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake: per-slice scaled byte means over ``n_features``
    contiguous byte slices (np.array_split boundaries — a stand-in for an
    image-embedding model). Each feature is ``(slice_sum * 100) //
    slice_len`` computed with EXACT integer arithmetic (stored as an
    integral double), so the result is bit-identical across engines and
    carries an exact SQL oracle. The mapInPandas generator shape —
    iterate batches, yield frames — is exactly what a real decoder uses.
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                chunks = np.array_split(arr.astype(np.int64), n_features)
                feats.append(
                    [
                        float((int(c.sum()) * 100) // len(c)) if len(c) else 0.0
                        for c in chunks
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_type", "n_bytes", "payload").mapInPandas(
        gen, FEATURE_SCHEMA
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("decoded", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decoded_features(media: DataFrame) -> DataFrame:
    """Feature extraction through the REAL decoders where one exists.

    image/bmp -> [height, width, floor(mean_R*100), floor(mean_G*100)];
    audio/wav -> [n_frames, sample_rate, n_channels, floor(mean|x|*100)].
    Payloads with no pure-Python codec (or that fail to parse) fall back
    to the deterministic byte-slice features with decoded=0, so one bad
    payload degrades to the fake path instead of failing the partition —
    the error-isolation shape a 100 TB media scan needs. All features are
    exact integers stored as doubles (cross-engine stable).
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            decoded, feats = [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                try:
                    obj = decode_media(bytes(payload), mt)
                except (NotImplementedError, ValueError):
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    chunks = np.array_split(arr.astype(np.int64), 4)
                    decoded.append(0)
                    feats.append(
                        [
                            float((int(c.sum()) * 100) // len(c)) if len(c) else 0.0
                            for c in chunks
                        ]
                    )
                    continue
                decoded.append(1)
                if mt == "image/bmp":
                    img = obj
                    h, w = img.shape[0], img.shape[1]
                    n = h * w
                    feats.append(
                        [
                            float(h),
                            float(w),
                            float(int(img[:, :, 0].astype(np.int64).sum()) * 100 // n),
                            float(int(img[:, :, 1].astype(np.int64).sum()) * 100 // n),
                        ]
                    )
                else:  # audio/wav
                    samples, rate = obj
                    n = max(1, samples.size)
                    mean_abs_x100 = int(np.abs(samples.astype(np.int64)).sum()) * 100 // n
                    feats.append(
                        [
                            float(samples.shape[0]),
                            float(rate),
                            float(samples.shape[1]),
                            float(mean_abs_x100),
                        ]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "decoded": pd.Series(decoded, dtype="int32"),
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        gen, DECODED_SCHEMA
    )


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """'Resize' stand-in: real image resize of compressed formats needs a
    codec (PIL — absent here), so the stub downsamples the payload bytes
    deterministically by the same area ratio a resize would and rewrites
    the width/height metadata. The Spark-side contract is the real part:
    binary in -> binary out through Arrow batches, metadata kept in sync.
    (BMP payloads could round-trip through decode_bmp for a true resize;
    the stub stays format-agnostic so every media_type takes one path.)
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_payload = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                ratio = max(1, int((int(w) * int(h)) / (target_w * target_h)))
                out_payload.append(arr[::ratio].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payload,
                    "width": target_w,
                    "height": target_h,
                    "n_bytes": [len(p) for p in out_payload],
                }
            )

    return media.select(
        "doc_id", "media_type", "payload", "width", "height", "n_bytes"
    ).mapInPandas(gen, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per sampled offset of each
    payload (what video frame extraction produces), fully vectorized via
    posexplode of a JVM-computed offset sequence — no Python at all."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_bytes") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return media.select(
        "doc_id",
        "media_type",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
