"""MJPEG-in-MP4 (ISO BMFF) video codec in pure Python — no ffmpeg here.

Motion-JPEG is a legal MP4/QuickTime payload (sample-entry fourcc
``jpeg``/``mjpa``): every sample in the track is a standalone baseline
JPEG, so the numpy JPEG codec (``operators/jpeg.py``) decodes real MP4
video with zero external dependencies — the same trick ``operators/
avi.py`` plays for RIFF. That closes the mp4 FRAME-decode gap for the
intra-frame subset; inter-frame codecs (avc1/hvc1/mp4v/vp09/av01)
still raise NotImplementedError because they genuinely need a codec
library this container doesn't ship (ffmpeg).

This is a real demuxer, not a byte scan: it walks the box tree
(``moov/trak/mdia/minf/stbl``), reads the sample tables — ``stsd``
(codec), ``stsz`` (sample sizes), ``stco``/``co64`` (chunk offsets),
``stsc`` (sample-to-chunk runs), ``stts`` + ``mdhd`` timescale (frame
rate) — and reconstructs each sample's byte extent exactly the way a
standards-following player does. The reference pipeline has no media
path at all (it ships log text, newrelic/aws-log-ingestion
src/function.py); this module belongs to the training-data-pipeline
extension surface, where routing/decoding opaque media columns is a
first-class 100 TB concern.

Decoder returns ``(frames, fps)`` — frames a list of (H, W, 3) uint8
arrays. Malformed bytes raise ValueError so the per-row fallback
isolation in ``multimodal.decoded_features`` keeps working.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

#: sample-entry fourccs whose samples are standalone JPEGs (QuickTime
#: Motion-JPEG A/B and the raw 'jpeg' entry; mjpb's bitstream tweaks
#: don't apply to baseline encodes like ours, so it stays off the list)
_MJPEG_FOURCC = (b"jpeg", b"mjpa", b"mjpg", b"MJPG")

#: recognized inter-frame codecs: honestly out of scope, distinct error
_INTERFRAME_FOURCC = (b"avc1", b"avc3", b"hvc1", b"hev1", b"mp4v", b"vp09", b"av01")


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


def encode_mp4_mjpeg(frames, fps: int = 10, quality: int = 50) -> bytes:
    """Encode (H, W, 3) uint8 frames as a Motion-JPEG MP4: ``ftyp`` +
    ``mdat`` (samples = independent baseline JPEGs, 4:4:4) + ``moov``
    with full sample tables (one chunk holding all samples; stsz per
    sample, stts one run at 1 tick/frame with mdhd timescale = fps).
    DC-exact constant frames round-trip bit-exactly (see jpeg.py)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_mp4_mjpeg wants at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    if fps <= 0:
        raise ValueError("fps must be positive")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(jpegs))
    first_sample_off = len(ftyp) + 8  # absolute offset of sample 0

    # moov ---------------------------------------------------------------
    mvhd = _full(
        b"mvhd",
        struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", fps, n)  # timescale = fps -> duration = n ticks
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate 1.0, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        struct.pack(">III4x", 0, 0, 1)  # times, track id
        + struct.pack(">I8x", n)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed-point dims
        flags=0x7,  # enabled | in movie | in preview
    )
    mdhd = _full(
        b"mdhd",
        struct.pack(">II", 0, 0) + struct.pack(">II", fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)

    # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3)
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, 1))  # n samples x 1 tick
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))  # 1 chunk, n samples
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _full(b"stco", struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _boxes(p: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) over an ISO-BMFF region,
    honoring 64-bit largesize and size-0 (to end of region) boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", p, pos)
        typ = p[pos + 4 : pos + 8]
        if size == 1:
            size = struct.unpack_from(">Q", p, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
            hdr = 8
        else:
            hdr = 8
        if size < hdr or pos + size > end:
            raise ValueError("mp4 box overruns container")
        yield typ, pos + hdr, pos + size
        pos += size


def _read_sample_tables(p: bytes, stbl_start: int, stbl_end: int):
    """Parse one stbl: returns (codec_fourcc, sizes, chunk_offsets,
    stsc_runs, (stts_first_delta, timescale_placeholder))."""
    codec = None
    sizes = None
    offsets = None
    stsc_runs = None
    first_delta = None
    for typ, b0, b1 in _boxes(p, stbl_start, stbl_end):
        if typ == b"stsd":
            (cnt,) = struct.unpack_from(">I", p, b0 + 4)
            if cnt >= 1:
                codec = p[b0 + 12 : b0 + 16]
        elif typ == b"stsz":
            uniform, cnt = struct.unpack_from(">II", p, b0 + 4)
            if uniform:
                sizes = [uniform] * cnt
            else:
                sizes = list(struct.unpack_from(f">{cnt}I", p, b0 + 12))
        elif typ == b"stco":
            (cnt,) = struct.unpack_from(">I", p, b0 + 4)
            offsets = list(struct.unpack_from(f">{cnt}I", p, b0 + 8))
        elif typ == b"co64":
            (cnt,) = struct.unpack_from(">I", p, b0 + 4)
            offsets = list(struct.unpack_from(f">{cnt}Q", p, b0 + 8))
        elif typ == b"stsc":
            (cnt,) = struct.unpack_from(">I", p, b0 + 4)
            stsc_runs = [
                struct.unpack_from(">III", p, b0 + 8 + 12 * i) for i in range(cnt)
            ]
        elif typ == b"stts":
            (cnt,) = struct.unpack_from(">I", p, b0 + 4)
            if cnt >= 1:
                _, first_delta = struct.unpack_from(">II", p, b0 + 8)
    return codec, sizes, offsets, stsc_runs, first_delta


def _sample_extents(sizes, offsets, stsc_runs):
    """Expand the stsc chunk-run table into per-sample (offset, size),
    walking chunks in order and summing sizes within each chunk — the
    standard ISO-BMFF reconstruction."""
    extents = []
    n_chunks = len(offsets)
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(stsc_runs):
        last_chunk = (
            stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else n_chunks
        )
        for ci in range(first_chunk - 1, last_chunk):
            off = offsets[ci]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return extents
                extents.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return extents


def decode_mp4_mjpeg(payload: bytes):
    """Decode a Motion-JPEG MP4 into ``(frames, fps)``: walk the box
    tree, find the first track whose stsd fourcc is a Motion-JPEG entry,
    reconstruct sample extents from stsz/stco/stsc and JPEG-decode each
    sample. fps = mdhd timescale / first stts delta (rounded). Raises
    NotImplementedError for recognized inter-frame codecs (avc1 etc. —
    needs ffmpeg) and ValueError for anything malformed."""
    try:
        if len(payload) < 12 or payload[4:8] != b"ftyp":
            raise ValueError("not an ISO-BMFF payload")

        found = None  # (codec, sizes, offsets, stsc_runs, delta, timescale)
        seen_interframe = None

        def walk(start, end, timescale):
            nonlocal found, seen_interframe
            for typ, b0, b1 in _boxes(payload, start, end):
                if typ in (b"moov", b"trak", b"minf"):
                    walk(b0, b1, timescale)
                elif typ == b"mdia":
                    # mdhd carries this track's timescale; read it first
                    ts = timescale
                    for t2, c0, c1 in _boxes(payload, b0, b1):
                        if t2 == b"mdhd":
                            ver = payload[c0]
                            ts = struct.unpack_from(
                                ">I", payload, c0 + (20 if ver == 1 else 12)
                            )[0]
                    walk(b0, b1, ts)
                elif typ == b"stbl" and found is None:
                    codec, sizes, offsets, runs, delta = _read_sample_tables(
                        payload, b0, b1
                    )
                    if codec in _MJPEG_FOURCC and sizes and offsets and runs:
                        found = (sizes, offsets, runs, delta, timescale)
                    elif codec in _INTERFRAME_FOURCC:
                        seen_interframe = codec

        walk(0, len(payload), None)
        if found is None:
            if seen_interframe is not None:
                raise NotImplementedError(
                    f"mp4 track codec {seen_interframe.decode('ascii', 'replace')!r}"
                    " is inter-frame — no pure-Python codec for it here (needs"
                    " ffmpeg); only Motion-JPEG mp4 decodes in this environment"
                )
            raise ValueError("no Motion-JPEG video track in mp4")

        sizes, offsets, runs, delta, timescale = found
        frames = []
        for off, size in _sample_extents(sizes, offsets, runs):
            if off + size > len(payload):
                raise ValueError("mp4 sample extent overruns container")
            frames.append(decode_jpeg(payload[off : off + size]))
        if not frames:
            raise ValueError("mp4 Motion-JPEG track has no samples")
        if any(f.shape != frames[0].shape for f in frames):
            raise ValueError("mp4 frames disagree on dimensions")
        fps = round(timescale / delta) if timescale and delta else 0
        return frames, fps
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError) as exc:  # truncated/garbled container
        raise ValueError(f"malformed mp4: {exc}") from exc
