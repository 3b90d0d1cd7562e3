"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched ``mapInPandas``. Decode
is REAL for the four formats a pure-Python parser can handle — BMP
(24-bit BI_RGB), WAV (8/16-bit integer PCM), PNG (8-bit gray/RGB/
palette/alpha via stdlib zlib + numpy unfiltering) and baseline JPEG
(marker walk + Huffman + IDCT in numpy, ``operators/jpeg.py``) — plus
the two intra-frame video containers those codecs unlock: MJPEG-in-AVI
(``operators/avi.py``) and Motion-JPEG MP4 (``operators/mp4.py``, a
real ISO-BMFF demuxer over the sample tables). Inter-frame video
(h264/h265 in mp4) still raises NotImplementedError (no ffmpeg in this
container); the deterministic fake extractor stands in for that. The Spark-side plumbing (schema, batch iteration, partitioning,
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


def encode_bmp(img) -> bytes:
    """Re-encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (BITMAPINFOHEADER, bottom-up, rows padded to 4 bytes) — the exact
    inverse of ``decode_bmp`` (decode(encode(img)) == img, pinned by
    tests/test_media_decode.py)."""
    import struct

    import numpy as np

    h, w = img.shape[0], img.shape[1]
    row_stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB->BGR
    pixels = rows.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(pixels), 0, 0, 54,
        40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    return header + pixels


def decode_png(payload: bytes):
    """Real decode of an 8-bit-depth non-interlaced PNG — pure stdlib
    ``zlib`` inflate + numpy scanline unfiltering, no codec library.
    Supports color types 0 (gray), 2 (RGB), 3 (palette -> RGB), 4
    (gray+alpha) and 6 (RGBA); all five PNG row filters (None/Sub/Up/
    Average/Paeth). Returns an (H, W, C) uint8 array (palette images
    expand to C=3). Raises ValueError on anything else (16-bit depth,
    Adam7 interlace, truncated/corrupt streams) so callers' per-row
    fallback isolation keeps working.

    Filters None/Up are whole-row numpy ops and Sub is a modular cumsum,
    so payloads from ``encode_png`` (filter 0) decode at array speed;
    Average/Paeth rows fall back to a per-pixel loop (the reconstruction
    is inherently sequential in the left neighbor)."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            if len(body) != 13:  # struct.error would escape the ValueError contract
                raise ValueError("bad PNG IHDR chunk length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or not (w and h):
        raise ValueError(
            f"unsupported PNG: depth={depth} comp={comp} interlace={interlace}"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    stride = w * channels
    expected = h * (stride + 1)
    # IHDR w/h are untrusted 32-bit fields and size both the inflate and
    # the output array; cap them (and bound the inflate itself) so a
    # crafted header/bomb stays on the ValueError per-row-fallback path
    # instead of OOM-killing the task (same class as the JPEG SOF guard).
    if expected > (1 << 26):
        raise ValueError(f"PNG {w}x{h}x{channels} exceeds the decoder size cap")
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"bad PNG deflate stream: {exc}") from None
    if len(raw) != expected:
        raise ValueError("bad PNG scanline geometry")
    if not d.eof or d.unused_data:
        raise ValueError("truncated or trailing PNG deflate stream")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f, row = int(lines[y, 0]), lines[y, 1:]
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub: recon[x] = row[x] + recon[x-bpp] == mod-256 cumsum
            rec = np.cumsum(
                row.reshape(w, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps mod 256, per spec)
            rec = row + prev
        elif f in (3, 4):  # Average / Paeth: sequential in the left pixel
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        img = pal[idx]
    return img


def encode_png(img) -> bytes:
    """Re-encode an (H, W[, C]) uint8 array as an 8-bit non-interlaced
    PNG (filter 0 on every row, one zlib IDAT) — the inverse of
    ``decode_png`` (decode(encode(img)) == img, pinned by
    tests/test_media_decode.py). C of 1/2/3/4 maps to color type
    0/4/2/6."""
    import struct
    import zlib

    import numpy as np

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    lines = np.zeros((h, w * c + 1), dtype=np.uint8)
    lines[:, 1:] = img.reshape(h, w * c)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def resize_nn(img, target_w: int, target_h: int):
    """Integer nearest-neighbor resize of an (H, W, 3) array: output
    pixel (r, c) samples source pixel (r*H//target_h, c*W//target_w) —
    pure integer index arithmetic, bit-deterministic across platforms
    (no float rounding), the standard decimation used for thumbnailing
    training images."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    rr = (np.arange(target_h, dtype=np.int64) * h) // target_h
    cc = (np.arange(target_w, dtype=np.int64) * w) // target_w
    return img[rr][:, cc]


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
            if len(body) < 16:  # struct.error would escape the ValueError contract
                raise ValueError("short WAV fmt chunk")
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


def encode_wav(samples, rate: int = 8000, bits: int = 16) -> bytes:
    """Re-encode (n_frames, channels) integer samples as RIFF/WAVE PCM —
    the exact inverse of ``decode_wav`` for 8/16-bit integer PCM."""
    import struct

    import numpy as np

    n_frames, ch = samples.shape
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:  # 8-bit PCM is unsigned, centred at 128
        data = (np.asarray(samples) + 128).astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


DECODABLE_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def synth_decodable_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads from doc_id alone — the driver-
    gate input that exercises ``decode_bmp``/``decode_wav`` end-to-end
    (not just on pytest fixtures). Every pixel/sample is a closed-form
    integer function of doc_id, so an engine with NO codec can still
    compute the decoded features exactly (the DuckDB oracle does):

      doc_id%6==0 -> 24-bit BMP, W = doc_id%7+2, H = doc_id%5+2,
        pixel(r, c, channel k) = (doc_id*7 + r*5 + c*3 + k*11) % 256
      doc_id%6==3 -> baseline JPEG (quality 50, 4:4:4), constant gray
        v = ((doc_id*9) % 127) * 2, W = doc_id%5+3, H = doc_id%3+2.
        v is EVEN so the luma DC quantization (Q00=16 at quality 50)
        round-trips exactly: DCT DC = 8*(v-128), quantized (v-128)/2
        with zero remainder, and R=G=B makes Cb=Cr exactly 128 (chroma
        DC = 0) — so the LOSSY codec decodes these payloads to exactly
        v in every channel and the SQL oracle stays closed-form
      doc_id%6==1 -> 16-bit PCM WAV, channels = (doc_id//2)%2+1,
        n_frames = doc_id%50+10, rate = 8000 + (doc_id%4)*4000,
        interleaved sample i = (doc_id*13 + i*7) % 4096 - 2048
      doc_id%6==4 -> MJPEG AVI (quality 50), n_frames = doc_id%4+2,
        W = doc_id%5+3, H = (doc_id//2)%3+2, fps = doc_id%5+5; frame i
        is constant gray v_i = ((doc_id*9 + i*31) % 127) * 2 — even, so
        every frame is DC-exact (same argument as the JPEG arm) and the
        lossy video codec decodes to exactly v_i per frame
      doc_id%3==2 -> 8-bit PNG (RGB when (doc_id//3)%2==0 else RGBA),
        W = doc_id%6+2, H = doc_id%4+2,
        pixel(r, c, channel k) = (doc_id*11 + r*3 + c*7 + k*5) % 256
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, mts = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 3 == 0:
                    if d % 6 == 3:
                        from .jpeg import encode_jpeg

                        v = ((d * 9) % 127) * 2
                        w, h = d % 5 + 3, d % 3 + 2
                        img = np.full((h, w, 3), v, dtype=np.uint8)
                        payloads.append(encode_jpeg(img, quality=50))
                        mts.append("image/jpeg")
                        continue
                    w, h = d % 7 + 2, d % 5 + 2
                    r = np.arange(h).reshape(h, 1, 1)
                    c = np.arange(w).reshape(1, w, 1)
                    k = np.arange(3).reshape(1, 1, 3)
                    img = ((d * 7 + r * 5 + c * 3 + k * 11) % 256).astype(np.uint8)
                    payloads.append(encode_bmp(img))
                    mts.append("image/bmp")
                elif d % 3 == 1:
                    if d % 6 == 4:
                        from .avi import encode_avi_mjpeg

                        n = d % 4 + 2
                        w, h = d % 5 + 3, (d // 2) % 3 + 2
                        frames = [
                            np.full((h, w, 3), ((d * 9 + i * 31) % 127) * 2, np.uint8)
                            for i in range(n)
                        ]
                        payloads.append(
                            encode_avi_mjpeg(frames, fps=d % 5 + 5, quality=50)
                        )
                        mts.append("video/avi")
                        continue
                    ch = (d // 2) % 2 + 1
                    n = d % 50 + 10
                    rate = 8000 + (d % 4) * 4000
                    i = np.arange(n * ch, dtype=np.int64)
                    s = (d * 13 + i * 7) % 4096 - 2048
                    payloads.append(encode_wav(s.reshape(n, ch), rate=rate))
                    mts.append("audio/wav")
                else:
                    w, h = d % 6 + 2, d % 4 + 2
                    nch = 3 if (d // 3) % 2 == 0 else 4
                    r = np.arange(h).reshape(h, 1, 1)
                    c = np.arange(w).reshape(1, w, 1)
                    k = np.arange(nch).reshape(1, 1, nch)
                    img = ((d * 11 + r * 3 + c * 7 + k * 5) % 256).astype(np.uint8)
                    payloads.append(encode_png(img))
                    mts.append("image/png")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": mts, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(gen, DECODABLE_MEDIA_SCHEMA)


def synth_mp4_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL Motion-JPEG MP4 payloads from doc_id alone —
    the driver-gate input exercising the ISO-BMFF demuxer
    (operators/mp4.py) end-to-end. Takes the doc_id%6==2 residue (which
    in ``synth_decodable_media`` carries PNGs, so unioning the two
    generators keeps every doc's media set collision-free by (doc_id,
    media_type)). Closed forms, all integer:

      n_frames = (doc_id//6)%4+2, W = doc_id%5+3, H = (doc_id//6)%3+2,
      fps = doc_id%4+4; frame i is constant gray
      v_i = ((doc_id*5 + i*29) % 127) * 2 — even, so every sample is
      DC-exact under the quality-50 quantizer (see synth_decodable_media)
      and the lossy codec decodes to exactly v_i per frame. (Moduli are
      chosen against the fixed doc_id%6==2 residue so each field really
      varies — e.g. doc_id%3 would be the constant 2 here.)
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        from .mp4 import encode_mp4_mjpeg

        for pdf in batches:
            payloads = []
            ids = [int(d) for d in pdf["doc_id"] if int(d) % 6 == 2]
            for d in ids:
                n = (d // 6) % 4 + 2
                w, h = d % 5 + 3, (d // 6) % 3 + 2
                frames = [
                    np.full((h, w, 3), ((d * 5 + i * 29) % 127) * 2, np.uint8)
                    for i in range(n)
                ]
                payloads.append(encode_mp4_mjpeg(frames, fps=d % 4 + 4, quality=50))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": ["video/mp4"] * len(ids),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(gen, DECODABLE_MEDIA_SCHEMA)


def decode_media(payload: bytes, media_type: str):
    """Codec dispatch. REAL for the four formats a pure-Python parser
    can handle: image/bmp -> (H, W, 3) uint8 RGB; image/png -> (H, W, C)
    uint8 via stdlib zlib; image/jpeg -> baseline-DCT numpy decode
    (operators/jpeg.py); audio/wav -> (samples[n, ch] int32, rate).
    video/avi -> (frames list of (H, W, 3) uint8, fps) for MJPEG streams
    (RIFF walk + per-frame JPEG decode, operators/avi.py); video/mp4 ->
    the same for Motion-JPEG tracks (ISO-BMFF sample-table demux,
    operators/mp4.py). Inter-frame video (h264/h265/vp9/av1 in mp4)
    still raises NotImplementedError — those codecs genuinely need
    libraries this container doesn't ship (ffmpeg)."""
    if media_type == "image/bmp":
        return decode_bmp(payload)
    if media_type == "image/png":
        return decode_png(payload)
    if media_type == "image/jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if media_type == "audio/wav":
        return decode_wav(payload)
    if media_type == "video/avi":
        from .avi import decode_avi_mjpeg

        return decode_avi_mjpeg(payload)
    if media_type == "video/mp4":
        from .mp4 import decode_mp4_mjpeg

        # real for Motion-JPEG tracks; raises NotImplementedError itself
        # for recognized inter-frame codecs (avc1/hvc1/... need ffmpeg)
        return decode_mp4_mjpeg(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "bmp/png/jpeg/wav/avi+mp4(MJPEG) decode is real, others use fake_features()"
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

    image/bmp, image/png -> [height, width, floor(mean_ch0*100),
    floor(mean_ch1*100)] (gray PNGs repeat channel 0);
    audio/wav -> [n_frames, sample_rate, n_channels, floor(mean|x|*100)];
    video/avi (MJPEG) -> [n_frames, height, width, floor(mean_ch0*100)].
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
            # JPEG rows decode through the batched lockstep decoder when
            # the Arrow batch is wide enough for it to win (measured
            # crossover in jpeg._LOCKSTEP_MIN) — results (arrays OR the
            # exact per-payload ValueError) are identical to per-row
            # decode_jpeg, so the fallback rows and features do not
            # change; decode_jpeg_batch itself falls back to scalar for
            # narrow sampling-structure groups.
            jpeg_pre: dict = {}
            jrows = [
                j
                for j, mt in enumerate(pdf["media_type"])
                if mt == "image/jpeg"
            ]
            from .jpeg import _LOCKSTEP_MIN, decode_jpeg_batch

            if len(jrows) >= _LOCKSTEP_MIN:
                outs = decode_jpeg_batch(
                    [bytes(pdf["payload"].iloc[j]) for j in jrows]
                )
                jpeg_pre = dict(zip(jrows, outs))

            decoded, feats = [], []
            for row_j, (payload, mt) in enumerate(
                zip(pdf["payload"], pdf["media_type"])
            ):
                try:
                    pre = jpeg_pre.get(row_j)
                    if pre is not None:
                        if isinstance(pre, Exception):
                            raise pre
                        obj = pre
                    else:
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
                if mt in ("image/bmp", "image/png", "image/jpeg"):
                    img = obj
                    h, w = img.shape[0], img.shape[1]
                    c1 = min(1, img.shape[2] - 1)  # gray PNGs: ch0 twice
                    n = h * w
                    feats.append(
                        [
                            float(h),
                            float(w),
                            float(int(img[:, :, 0].astype(np.int64).sum()) * 100 // n),
                            float(int(img[:, :, c1].astype(np.int64).sum()) * 100 // n),
                        ]
                    )
                elif mt in ("video/avi", "video/mp4"):
                    frames, fps = obj
                    h, w = frames[0].shape[0], frames[0].shape[1]
                    tot = sum(
                        int(f[:, :, 0].astype(np.int64).sum()) for f in frames
                    )
                    feats.append(
                        [
                            float(len(frames)),
                            float(h),
                            float(w),
                            float(tot * 100 // (len(frames) * h * w)),
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
    """Resize through the REAL pixel path where a pure-Python codec
    exists: ``image/bmp`` and ``image/png`` payloads decode
    (``decode_bmp``/``decode_png``), resample by integer nearest-neighbor
    (``resize_nn``, channel-count agnostic) and re-encode with the
    matching encoder — a true pixel resize, round-trip pinned against a
    numpy oracle in tests/test_media_decode.py. Codec-less formats (and
    images that fail to parse) keep the deterministic byte-downsample
    stand-in — same area ratio a resize would apply, metadata rewritten —
    so one undecodable payload degrades instead of failing the partition.
    The Spark contract is identical either way: binary in -> binary out
    through Arrow batches, width/height metadata kept in sync."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_payload = []
            for payload, mt, w, h in zip(
                pdf["payload"], pdf["media_type"], pdf["width"], pdf["height"]
            ):
                if mt in ("image/bmp", "image/png", "image/jpeg"):
                    try:
                        if mt == "image/bmp":
                            img = decode_bmp(bytes(payload))
                            enc = encode_bmp
                        elif mt == "image/jpeg":
                            from .jpeg import decode_jpeg, encode_jpeg

                            img = decode_jpeg(bytes(payload))
                            enc = encode_jpeg
                        else:
                            img = decode_png(bytes(payload))
                            enc = encode_png
                        out_payload.append(enc(resize_nn(img, target_w, target_h)))
                        continue
                    except ValueError:
                        pass  # unparseable image -> byte-downsample fallback
                elif mt in ("video/avi", "video/mp4"):
                    try:
                        if mt == "video/avi":
                            from .avi import decode_avi_mjpeg as dec
                            from .avi import encode_avi_mjpeg as enc_v
                        else:
                            from .mp4 import decode_mp4_mjpeg as dec
                            from .mp4 import encode_mp4_mjpeg as enc_v

                        frames, fps = dec(bytes(payload))
                        out_payload.append(
                            enc_v(
                                [resize_nn(f, target_w, target_h) for f in frames],
                                fps=max(1, fps),
                            )
                        )
                        continue
                    except (ValueError, NotImplementedError):
                        pass  # unparseable/inter-frame video -> byte-downsample
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


MEDIA_PROBE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("container", StringType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def media_probe(media: DataFrame) -> DataFrame:
    """ffprobe-style container metadata over binary payloads (operators/
    probe.py): container, codec, dims, duration — header parsing only,
    no entropy decode. This is the stage a 100 TB multimodal ingest runs
    FIRST, so that codec routing / dimension filtering happens before
    any payload reaches expensive decode; mp4 metadata is fully real
    here even though mp4 FRAME decode needs ffmpeg. Unknown/corrupt
    payloads yield container='unknown' with null fields (countable for
    data-quality dashboards) rather than failing the partition."""
    from .probe import probe_media

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ("container", "codec", "width", "height", "duration_ms")}
            for payload in pdf["payload"]:
                try:
                    cont, codec, w, h, dur = probe_media(bytes(payload))
                except ValueError:
                    cont, codec, w, h, dur = "unknown", None, None, None, None
                cols["container"].append(cont)
                cols["codec"].append(codec)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["duration_ms"].append(dur)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **cols})

    return media.select("doc_id", "payload").mapInPandas(gen, MEDIA_PROBE_SCHEMA)


def synth_probe_media(docs: DataFrame) -> DataFrame:
    """Probe-gate input: the five decodable arms of synth_decodable_media
    for doc_id%6 != 5, and for doc_id%6==5 a metadata-only ISO-BMFF mp4
    stub (operators/probe.py::encode_mp4_stub) with closed-form fields:
    W=(doc_id%16+1)*16, H=(doc_id%9+1)*16, duration_ms=doc_id%9000+1000,
    codec avc1 when (doc_id//6)%2==0 else hvc1."""
    from .probe import encode_mp4_stub

    base = synth_decodable_media(docs.filter(F.col("doc_id") % 6 != 5))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_mp4_stub(
                        (d % 16 + 1) * 16,
                        (d % 9 + 1) * 16,
                        d % 9000 + 1000,
                        codec=b"avc1" if (d // 6) % 2 == 0 else b"hvc1",
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video/mp4",
                    "payload": payloads,
                }
            )

    mp4 = (
        docs.filter(F.col("doc_id") % 6 == 5)
        .select("doc_id")
        .mapInPandas(gen, DECODABLE_MEDIA_SCHEMA)
    )
    return base.unionByName(mp4)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("mean_abs_x100", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def audio_energy_windows(media: DataFrame, win: int = 256) -> DataFrame:
    """Windowed audio energy over REAL-decoded WAV payloads — the
    voice-activity-detection / silence-trim primitive of an audio
    training pipeline. Each ``audio/wav`` payload is PCM-decoded
    (operators' pure struct+numpy ``decode_wav``), channels are averaged
    (floor division — integer-exact), and one row per ``win``-sample
    window reports floor(mean|x|*100) plus the exact sum of squares
    (integer energy; cross-engine stable where sqrt/float RMS is not).
    Non-WAV and unparseable rows are dropped. mapInPandas generator:
    each task decodes only its partition's payloads and emits small
    per-window rows — the same 100 TB shape as video_frame_features."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                k: []
                for k in ("doc_id", "win_idx", "n_samples", "mean_abs_x100", "sum_sq")
            }
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mt != "audio/wav":
                    continue
                try:
                    samples, _rate = decode_wav(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
                for wi in range(0, (len(mono) + win - 1) // win):
                    seg = mono[wi * win : (wi + 1) * win]
                    rows["doc_id"].append(int(doc_id))
                    rows["win_idx"].append(wi)
                    rows["n_samples"].append(len(seg))
                    rows["mean_abs_x100"].append(
                        int(np.abs(seg).sum()) * 100 // len(seg)
                    )
                    rows["sum_sq"].append(int((seg * seg).sum()))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        gen, AUDIO_WINDOW_SCHEMA
    )


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("rate_out", IntegerType()),
        StructField("n_frames_out", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sum_s", LongType()),
        StructField("sum_abs", LongType()),
    ]
)


def audio_resample(media: DataFrame, factor: int = 2) -> DataFrame:
    """Integer-decimation resample over REAL-decoded WAV payloads (keep
    every ``factor``-th frame, all channels; rate_out = rate // factor)
    — the cheap anti-aliasing-free downsample used to normalize mixed-
    rate audio corpora before feature extraction. The output payload is
    re-encoded PCM (same encode_wav the fixtures use); this operator
    reports the decoded-domain integer aggregates of the RESAMPLED
    stream (sum, sum|x|) so the whole decode->stride->re-encode->
    re-decode loop is exact-checkable cross-engine. Non-WAV rows drop."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "rate_out", "n_frames_out", "n_channels",
                    "sum_s", "sum_abs",
                )
            }
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mt != "audio/wav":
                    continue
                try:
                    samples, rate = decode_wav(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                out = samples[::factor]
                # round-trip through the encoder: the reported aggregates
                # describe what a DOWNSTREAM reader of the re-encoded
                # payload would see, not an internal array
                out2, rate2 = decode_wav(encode_wav(out, rate=rate // factor))
                a = out2.astype(np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["rate_out"].append(rate2)
                rows["n_frames_out"].append(a.shape[0])
                rows["n_channels"].append(a.shape[1])
                rows["sum_s"].append(int(a.sum()))
                rows["sum_abs"].append(int(np.abs(a).sum()))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        gen, AUDIO_RESAMPLE_SCHEMA
    )


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


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("mean_x100", LongType()),
    ]
)


def video_frame_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame extraction: decode each ``video/avi`` payload (RIFF
    walk + per-frame MJPEG decode, operators/avi.py) and each
    ``video/mp4`` payload (ISO-BMFF sample-table demux + per-sample
    JPEG decode, operators/mp4.py) and emit one row per every_n-th
    frame with its dimensions and channel-0 mean (x100, floor —
    integer-exact cross-engine). Non-video and unparseable rows
    are dropped, mirroring what a frame-extraction stage feeding a
    vision pipeline does. mapInPandas generator: one in-flight Arrow
    batch per task, frames never ship whole to the driver — at 100 TB
    each task decodes its own partition's payloads and emits only the
    small per-frame feature rows."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        from .avi import demux_avi_mjpeg
        from .jpeg import decode_jpeg_batch
        from .mp4 import demux_mp4_mjpeg

        for pdf in batches:
            # Demux first, decode ALL clips' frames in ONE lockstep batch
            # (r7): a short clip alone sits below the lockstep crossover
            # (jpeg._LOCKSTEP_MIN) and decoded scalar, but an Arrow batch
            # of clips supplies hundreds of same-structure frames, which
            # is exactly the width the batched decoder wants — measured
            # ~3x on the 6-frame-clip bench line. Row output is
            # bit-identical: decode_jpeg_batch returns per-frame results
            # equal to scalar decode_jpeg, and a clip with ANY failing
            # frame (or no frames, or disagreeing shapes) is dropped,
            # exactly as decode_media's ValueError drop did.
            clips = []  # (doc_id, n_frames) in row order
            blobs: list = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mt not in ("video/avi", "video/mp4"):
                    continue
                demux = demux_avi_mjpeg if mt == "video/avi" else demux_mp4_mjpeg
                try:
                    clip_blobs, _fps = demux(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                clips.append((int(doc_id), len(clip_blobs)))
                blobs.extend(clip_blobs)
            outs = decode_jpeg_batch(blobs) if blobs else []

            rows = {k: [] for k in ("doc_id", "frame_idx", "height", "width", "mean_x100")}
            pos = 0
            for doc_id, n in clips:
                frames = outs[pos : pos + n]
                pos += n
                if (
                    n == 0
                    or any(isinstance(f, Exception) for f in frames)
                    or any(f.shape != frames[0].shape for f in frames)
                ):
                    continue  # decode_media would have raised ValueError
                for i in range(0, n, every_n):
                    f = frames[i]
                    h, w = f.shape[0], f.shape[1]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["height"].append(h)
                    rows["width"].append(w)
                    rows["mean_x100"].append(
                        int(f[:, :, 0].astype(np.int64).sum()) * 100 // (h * w)
                    )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        gen, VIDEO_FRAME_SCHEMA
    )
