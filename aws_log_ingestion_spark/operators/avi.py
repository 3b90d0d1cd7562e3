"""MJPEG-in-AVI video codec in pure Python — no ffmpeg in this container.

AVI is a RIFF container: ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
strf)) LIST('movi' '00dc'*) idx1)``. With an ``MJPG`` video stream every
``00dc`` chunk is a standalone baseline JPEG, so the numpy JPEG codec
(``operators/jpeg.py``) decodes real video frames with zero external
dependencies. The same trick serves Motion-JPEG MP4 via the ISO-BMFF
demuxer in ``operators/mp4.py``; inter-frame codecs (h264/h265 in mp4)
still raise NotImplementedError in ``multimodal.decode_media`` — they
genuinely need ffmpeg.

Decoder returns ``(frames, fps)`` where frames is a list of (H, W, 3)
uint8 arrays (lists, not a 4-D array, so a malformed mid-stream frame
can surface as ValueError without partial-decode ambiguity). Encoder
exists so tests and the driver gate can round-trip: DC-exact constant
frames (see the JPEG codec notes) decode bit-exactly even though MJPEG
is lossy.

Malformed bytes raise ValueError so the per-row fallback isolation in
``multimodal.decoded_features`` keeps working — one bad payload
degrades, never fails the partition.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg_frames, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + payload, word-aligned."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 50) -> bytes:
    """Encode a sequence of (H, W, 3) uint8 frames as an MJPEG AVI.
    All frames must share one shape; each becomes an independent
    baseline JPEG ``00dc`` chunk (4:4:4, Annex-K tables quality-scaled).
    """
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi_mjpeg wants at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I",
            0,  # dwFlags
            0,  # wPriority + wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            len(jpegs),  # dwLength
            max_sz,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1 = default)
            0,  # dwSampleSize (0: variable-size samples)
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<I2i2H4s5I", 40, w, h, 1, 24, b"MJPG", max_sz, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    # idx1 offsets are relative to the start of the 'movi' list type word.
    idx_entries, off = [], 4
    for j in jpegs:
        idx_entries.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF region."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError("RIFF chunk overruns container")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def demux_avi_mjpeg(payload: bytes):
    """Demux-only half of ``decode_avi_mjpeg``: returns
    ``(jpeg_blobs, fps)`` without decoding any frame, so callers can
    pool frames from many clips into one lockstep ``decode_jpeg_batch``
    call (operators/multimodal.video_frame_features). Raises exactly the
    demux-stage errors of ``decode_avi_mjpeg``."""
    return _demux_avi(payload)


def decode_avi_mjpeg(payload: bytes):
    """Decode an MJPEG AVI into ``(frames, fps)``: frames a list of
    (H, W, 3) uint8 RGB arrays (one per ``00dc``/``00db`` chunk, decoded
    by the numpy baseline-JPEG decoder), fps from strh rate/scale with
    the avih micro-sec-per-frame as fallback. Raises ValueError on
    anything that is not a parseable MJPEG AVI (non-RIFF bytes, missing
    movi, a non-MJPG stream, or any frame the JPEG decoder rejects)."""
    blobs, fps = _demux_avi(payload)
    frames = decode_jpeg_frames(blobs)
    if not frames:
        raise ValueError("no frame chunks in AVI movi list")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("AVI frames disagree on dimensions")
    return frames, fps


def _demux_avi(payload: bytes):
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI payload")
        (riff_size,) = struct.unpack_from("<I", payload, 4)
        end = min(len(payload), 8 + riff_size)

        fps = None
        handler_ok = False
        frames = []
        for fourcc, p, size in _walk_chunks(payload, 12, end):
            if fourcc != b"LIST":
                continue
            list_type = payload[p : p + 4]
            if list_type == b"hdrl":
                for fcc2, p2, sz2 in _walk_chunks(payload, p + 4, p + size):
                    if fcc2 == b"avih" and sz2 >= 4:
                        (uspf,) = struct.unpack_from("<I", payload, p2)
                        if uspf and fps is None:
                            fps = round(1_000_000 / uspf)
                    elif fcc2 == b"LIST" and payload[p2 : p2 + 4] == b"strl":
                        for fcc3, p3, sz3 in _walk_chunks(
                            payload, p2 + 4, p2 + sz2
                        ):
                            if fcc3 == b"strh" and sz3 >= 28:
                                if payload[p3 : p3 + 4] != b"vids":
                                    continue
                                handler = payload[p3 + 4 : p3 + 8]
                                if handler not in (b"MJPG", b"mjpg"):
                                    raise ValueError(
                                        f"AVI stream handler {handler!r} is "
                                        "not MJPG — no codec for it here"
                                    )
                                handler_ok = True
                                scale, rate = struct.unpack_from(
                                    "<2I", payload, p3 + 20
                                )
                                if scale and rate:
                                    fps = round(rate / scale)
            elif list_type == b"movi":
                for fcc2, p2, sz2 in _walk_chunks(payload, p + 4, p + size):
                    if fcc2[2:4] in (b"dc", b"db"):
                        frames.append(payload[p2 : p2 + sz2])
        if not handler_ok:
            raise ValueError("no MJPG 'vids' stream header in AVI")
        return frames, (fps or 0)
    except ValueError:
        raise
    except (struct.error, IndexError) as exc:  # truncated/garbled container
        raise ValueError(f"malformed AVI: {exc}") from exc
