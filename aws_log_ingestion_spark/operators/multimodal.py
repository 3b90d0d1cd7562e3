"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched ``mapInPandas``. The
image/audio codec libraries are NOT in this container, so the actual
decode is stubbed (``decode_media`` raises NotImplementedError; the
deterministic fake extractor stands in) — the Spark-side plumbing
(schema, batch iteration, partitioning, UDF signatures) is real and
tested, which is the part that matters for the 100 TB design: binary
columns stream through Arrow without driver materialisation, and the
extractor is a per-batch generator so one oversized payload can't OOM a
whole partition.
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


def decode_media(payload: bytes, media_type: str):
    """Real codec decode — NOT IMPLEMENTED in this container (no PIL /
    ffmpeg / soundfile). The deterministic fake below keeps the pipeline
    testable; swap this in when codecs are available."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_features()"
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


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """'Resize' stand-in: real image resize needs a codec (PIL — absent
    here; decode_media raises), so the stub downsamples the payload bytes
    deterministically by the same area ratio a resize would and rewrites
    the width/height metadata. The Spark-side contract is the real part:
    binary in -> binary out through Arrow batches, metadata kept in sync.
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
