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
standards-following player does. FRAGMENTED mp4 (the DASH/HLS-segment
layout: empty sample tables + mvex, samples in moof/traf/tfhd/trun) is
demuxed too — per-fragment trun expansion with tfhd defaults and the
default-base-is-moof addressing rule. The reference pipeline has no media
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

from .jpeg import decode_jpeg_frames, encode_jpeg

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


def _track_boxes(w: int, h: int, fps: int, n: int):
    """The shared moov header boxes: (mvhd, tkhd, mdhd, hdlr, vmhd,
    dinf, stsd) — identical between the flat and fragmented layouts."""
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
    return mvhd, tkhd, mdhd, hdlr, vmhd, dinf, stsd


def encode_mp4_mjpeg(
    frames, fps: int = 10, quality: int = 50, fragment_size: int | None = None
) -> bytes:
    """Encode (H, W, 3) uint8 frames as a Motion-JPEG MP4: ``ftyp`` +
    ``mdat`` (samples = independent baseline JPEGs, 4:4:4) + ``moov``
    with full sample tables (one chunk holding all samples; stsz per
    sample, stts one run at 1 tick/frame with mdhd timescale = fps).
    With ``fragment_size=k`` the output is FRAGMENTED mp4 instead (the
    DASH/HLS-segment layout): ``ftyp`` + ``moov`` with empty sample
    tables + mvex/trex, then one ``moof``+``mdat`` pair per k frames,
    samples addressed by tfhd (default-base-is-moof) + trun
    (data_offset + per-sample sizes). DC-exact constant frames
    round-trip bit-exactly either way (see jpeg.py)."""
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
    if fragment_size is not None:
        if fragment_size < 1:
            raise ValueError("fragment_size must be >= 1")
        return ftyp + _fmp4_body(jpegs, w, h, fps, fragment_size)
    mdat = _box(b"mdat", b"".join(jpegs))
    first_sample_off = len(ftyp) + 8  # absolute offset of sample 0

    mvhd, tkhd, mdhd, hdlr, vmhd, dinf, stsd = _track_boxes(w, h, fps, n)
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


def _fmp4_body(jpegs, w: int, h: int, fps: int, fragment_size: int) -> bytes:
    """Everything after ftyp for the fragmented layout: moov with EMPTY
    sample tables + mvex/trex (announcing movie fragments), then one
    moof+mdat pair per ``fragment_size`` samples. Each traf uses
    default-base-is-moof + a default sample duration of 1 tick; the
    trun carries data_offset + per-sample sizes."""
    n = len(jpegs)
    mvhd, tkhd, mdhd, hdlr, vmhd, dinf, stsd = _track_boxes(w, h, fps, n)
    stts = _full(b"stts", struct.pack(">I", 0))
    stsc = _full(b"stsc", struct.pack(">I", 0))
    stsz = _full(b"stsz", struct.pack(">II", 0, 0))
    stco = _full(b"stco", struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(b"trex", struct.pack(">5I", 1, 1, 1, 0, 0))
    mvex = _box(b"mvex", trex)
    out = [_box(b"moov", mvhd + trak + mvex)]

    for seq, start in enumerate(range(0, n, fragment_size), start=1):
        frag = jpegs[start : start + fragment_size]
        k = len(frag)
        mfhd = _full(b"mfhd", struct.pack(">I", seq))
        # tfhd: default-base-is-moof (0x020000) + default duration (0x8)
        tfhd = _full(b"tfhd", struct.pack(">II", 1, 1), flags=0x020008)
        # trun: data_offset (0x1) + per-sample sizes (0x200); the offset
        # points past this moof and the mdat header — pure arithmetic:
        # moof = 8 + mfhd(16) + traf(8 + tfhd(20) + trun(20 + 4k))
        moof_size = 8 + 16 + (8 + 20 + (20 + 4 * k))
        trun = _full(
            b"trun",
            struct.pack(">Ii", k, moof_size + 8)
            + b"".join(struct.pack(">I", len(j)) for j in frag),
            flags=0x201,
        )
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        assert len(moof) == moof_size
        out.append(moof + _box(b"mdat", b"".join(frag)))
    return b"".join(out)


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
    stsc_runs, stts_first_delta) — the tables None/empty when absent
    (fragmented tracks keep an empty stbl)."""
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
                # cnt is untrusted: samples can't total more bytes than
                # the container holds, so a crafted count (e.g. 2**32-1)
                # must fail as ValueError, not a ~34 GB MemoryError that
                # would escape the per-row fallback isolation
                if cnt > len(p) or uniform * cnt > len(p):
                    raise ValueError("stsz uniform sample count overruns container")
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
    prev_first = 0
    for first_chunk, _pc, _d in stsc_runs:
        # first_chunk is 1-based and runs must be strictly increasing;
        # first_chunk=0 would make range() start at -1 and silently
        # alias offsets[-1] instead of failing the malformed-input way
        if first_chunk < 1 or first_chunk <= prev_first:
            raise ValueError("stsc runs must start at chunk >= 1 and increase")
        prev_first = first_chunk
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


def _parse_trak(p: bytes, b0: int, b1: int):
    """Parse one trak box: (track_id, timescale, codec, sizes, offsets,
    stsc_runs, stts_first_delta) — sample tables empty/None for
    fragmented tracks (their samples live in moof/trun instead)."""
    track_id = timescale = None
    codec = sizes = offsets = runs = delta = None
    for typ, c0, c1 in _boxes(p, b0, b1):
        if typ == b"tkhd":
            ver = p[c0]
            (track_id,) = struct.unpack_from(">I", p, c0 + (20 if ver == 1 else 12))
        elif typ == b"mdia":
            for t2, d0, d1 in _boxes(p, c0, c1):
                if t2 == b"mdhd":
                    ver = p[d0]
                    timescale = struct.unpack_from(
                        ">I", p, d0 + (20 if ver == 1 else 12)
                    )[0]
                elif t2 == b"minf":
                    for t3, e0, e1 in _boxes(p, d0, d1):
                        if t3 == b"stbl":
                            codec, sizes, offsets, runs, delta = (
                                _read_sample_tables(p, e0, e1)
                            )
    if codec is None:
        return None
    return (track_id, timescale, codec, sizes, offsets, runs, delta)


def _trex_defaults(p: bytes, track_id: int):
    """(default_sample_duration, default_sample_size) from moov/mvex/
    trex for ``track_id`` — the movie-level fallbacks a tfhd may omit
    (ISO 14496-12 §8.8.3). (None, None) when no trex matches."""
    for typ, b0, b1 in _boxes(p, 0, len(p)):
        if typ != b"moov":
            continue
        for t2, c0, c1 in _boxes(p, b0, b1):
            if t2 != b"mvex":
                continue
            for t3, d0, d1 in _boxes(p, c0, c1):
                if t3 == b"trex":
                    tid, _desc, dur, size, _flags = struct.unpack_from(
                        ">5I", p, d0 + 4
                    )
                    if tid == track_id:
                        return (dur or None, size or None)
    return (None, None)


def _fragment_extents(p: bytes, track_id: int):
    """Per-sample (offset, size) + first duration for a fragmented-mp4
    track: walk top-level moof boxes, match traf/tfhd to ``track_id``,
    expand each trun (per-sample sizes, else tfhd defaults, else the
    movie-level trex defaults; base offset = explicit tfhd
    base_data_offset or the moof start, the default-base-is-moof
    rule)."""
    trex_dur, trex_size = _trex_defaults(p, track_id)
    extents, delta = [], None
    for typ, b0, b1 in _boxes(p, 0, len(p)):
        if typ != b"moof":
            continue
        moof_start = b0 - 8
        for t2, c0, c1 in _boxes(p, b0, b1):
            if t2 != b"traf":
                continue
            tf_track = base = None
            def_dur, def_size = trex_dur, trex_size  # tfhd may override
            truns = []
            for t3, d0, d1 in _boxes(p, c0, c1):
                if t3 == b"tfhd":
                    flags = int.from_bytes(p[d0 + 1 : d0 + 4], "big")
                    (tf_track,) = struct.unpack_from(">I", p, d0 + 4)
                    off = d0 + 8
                    if flags & 0x1:  # base_data_offset
                        (base,) = struct.unpack_from(">Q", p, off)
                        off += 8
                    if flags & 0x2:  # sample_description_index
                        off += 4
                    if flags & 0x8:  # default_sample_duration
                        (def_dur,) = struct.unpack_from(">I", p, off)
                        off += 4
                    if flags & 0x10:  # default_sample_size
                        (def_size,) = struct.unpack_from(">I", p, off)
                        off += 4
                elif t3 == b"trun":
                    truns.append(d0)
            if tf_track != track_id:
                continue
            if base is None:
                base = moof_start
            for d0 in truns:
                flags = int.from_bytes(p[d0 + 1 : d0 + 4], "big")
                (n,) = struct.unpack_from(">I", p, d0 + 4)
                off = d0 + 8
                pos = base
                if flags & 0x1:  # data_offset (signed)
                    (doff,) = struct.unpack_from(">i", p, off)
                    off += 4
                    pos = base + doff
                if flags & 0x4:  # first_sample_flags
                    off += 4
                for _ in range(n):
                    dur = def_dur
                    if flags & 0x100:
                        (dur,) = struct.unpack_from(">I", p, off)
                        off += 4
                    size = def_size
                    if flags & 0x200:
                        (size,) = struct.unpack_from(">I", p, off)
                        off += 4
                    if flags & 0x400:  # sample_flags
                        off += 4
                    if flags & 0x800:  # composition offset
                        off += 4
                    if size is None:
                        raise ValueError("mp4 trun sample without a size")
                    extents.append((pos, size))
                    pos += size
                    if delta is None and dur:
                        delta = dur
    if not extents:
        raise ValueError("fragmented mp4 has no trun samples for the track")
    return extents, delta


def demux_mp4_mjpeg(payload: bytes):
    """Demux-only half of ``decode_mp4_mjpeg``: returns
    ``(jpeg_blobs, fps)`` without decoding any frame. Lets callers pool
    frame blobs from MANY clips into one ``decode_jpeg_batch`` call —
    short clips alone sit below the lockstep crossover, but frames of
    different clips share sampling structure and decode in lockstep
    together (operators/multimodal.video_frame_features). Raises exactly
    the demux-stage errors of ``decode_mp4_mjpeg``."""
    return _demux_mp4(payload)


def decode_mp4_mjpeg(payload: bytes):
    """Decode a Motion-JPEG MP4 into ``(frames, fps)``: walk the box
    tree, find the first track whose stsd fourcc is a Motion-JPEG entry,
    reconstruct sample extents from stsz/stco/stsc — or, for fragmented
    mp4 (empty sample tables + moof/mdat fragments, the DASH/HLS-segment
    layout), from each fragment's tfhd/trun run — and JPEG-decode each
    sample. fps = mdhd timescale / sample duration (rounded). Raises
    NotImplementedError for recognized inter-frame codecs (avc1 etc. —
    needs ffmpeg) and ValueError for anything malformed."""
    blobs, fps = _demux_mp4(payload)
    frames = decode_jpeg_frames(blobs)
    if not frames:
        raise ValueError("mp4 Motion-JPEG track has no samples")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("mp4 frames disagree on dimensions")
    return frames, fps


def _demux_mp4(payload: bytes):
    try:
        if len(payload) < 12 or payload[4:8] != b"ftyp":
            raise ValueError("not an ISO-BMFF payload")

        found = None  # (track_id, timescale, sizes, offsets, runs, delta)
        seen_interframe = None
        for typ, b0, b1 in _boxes(payload, 0, len(payload)):
            if typ != b"moov":
                continue
            for t2, c0, c1 in _boxes(payload, b0, b1):
                if t2 != b"trak":
                    continue
                info = _parse_trak(payload, c0, c1)
                if info is None:
                    continue
                track_id, timescale, codec, sizes, offsets, runs, delta = info
                if codec in _MJPEG_FOURCC and found is None:
                    found = (track_id, timescale, sizes, offsets, runs, delta)
                elif codec in _INTERFRAME_FOURCC and seen_interframe is None:
                    seen_interframe = codec
        if found is None:
            if seen_interframe is not None:
                raise NotImplementedError(
                    f"mp4 track codec {seen_interframe.decode('ascii', 'replace')!r}"
                    " is inter-frame — no pure-Python codec for it here (needs"
                    " ffmpeg); only Motion-JPEG mp4 decodes in this environment"
                )
            raise ValueError("no Motion-JPEG video track in mp4")

        track_id, timescale, sizes, offsets, runs, delta = found
        if sizes and offsets and runs:
            extents = _sample_extents(sizes, offsets, runs)
        else:  # fragmented: samples live in moof/trun
            extents, delta = _fragment_extents(payload, track_id)
        blobs = []
        for off, size in extents:
            if off + size > len(payload):
                raise ValueError("mp4 sample extent overruns container")
            blobs.append(payload[off : off + size])
        fps = round(timescale / delta) if timescale and delta else 0
        return blobs, fps
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError) as exc:  # truncated/garbled container
        raise ValueError(f"malformed mp4: {exc}") from exc
