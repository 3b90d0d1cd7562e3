"""Container-level media probing — the ffprobe-style metadata pass.

A 100 TB multimodal ingest filters/routes by codec and dimensions BEFORE
shipping payloads to expensive decode (GPU farms, transcode queues), so
the probe must be cheap, pure header parsing — no entropy decode. This
module reads just enough of each container to report
``(container, codec, width, height, duration_ms)``:

- BMP: 'BM' + BITMAPINFOHEADER dims
- PNG: IHDR dims + color type -> gray8/rgb8/pal8/graya8/rgba8
- JPEG: marker walk to SOF -> baseline vs progressive, dims
- WAV: fmt chunk (pcm8/pcm16) + data size -> duration
- AVI: avih dims + strh stream fourcc + frame count -> duration
- MP4 (ISO BMFF): box walk — ftyp, moov/mvhd timescale+duration,
  moov/trak/tkhd dims, moov/trak/mdia/minf/stbl/stsd sample-entry
  fourcc. Motion-JPEG tracks additionally FRAME-decode for real
  (``operators/mp4.py``); inter-frame codecs (avc1/hvc1/...) keep
  metadata-only probing here and NotImplementedError on decode — they
  genuinely need ffmpeg.

Unknown/corrupt payloads raise ValueError (callers drop or degrade the
row, never the partition).
"""

from __future__ import annotations

import struct


def _probe_bmp(p: bytes):
    if len(p) < 26 or p[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack_from("<ii", p, 18)
    return ("bmp", "rgb24", w, abs(h), None)


_PNG_CODEC = {0: "gray8", 2: "rgb8", 3: "pal8", 4: "graya8", 6: "rgba8"}


def _probe_png(p: bytes):
    if len(p) < 33 or p[:8] != b"\x89PNG\r\n\x1a\n" or p[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack_from(">II", p, 16)
    depth, ctype = p[24], p[25]
    codec = _PNG_CODEC.get(ctype)
    if codec is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    return ("png", codec if depth == 8 else f"{codec}@{depth}", w, h, None)


def _probe_jpeg(p: bytes):
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", p, pos + 2)[0]
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack_from(">HH", p, pos + 5)
            codec = "progressive" if marker == 0xC2 else "baseline"
            return ("jpeg", codec, w, h, None)
        if marker == 0xDA:
            break
        pos += 2 + seg_len
    raise ValueError("no SOF marker in JPEG")


def _probe_wav(p: bytes):
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, block, bits, data_size = 12, None, None, None, None
    while pos + 8 <= len(p):
        fourcc = p[pos : pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if fourcc == b"fmt " and size >= 16:
            _fmt, _ch, rate, _bps, block, bits = struct.unpack_from(
                "<HHIIHH", p, pos + 8
            )
        elif fourcc == b"data":
            data_size = size
        pos += 8 + size + (size % 2)
    if not rate or not block or data_size is None:
        raise ValueError("WAV missing fmt/data chunks")
    n_frames = data_size // block
    return ("riff-wave", f"pcm{bits}", None, None, n_frames * 1000 // rate)


def _probe_avi(p: bytes):
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    uspf = frames = w = h = None
    codec = None

    def walk(start, end):
        nonlocal uspf, frames, w, h, codec
        pos = start
        while pos + 8 <= end:
            fourcc = p[pos : pos + 4]
            (size,) = struct.unpack_from("<I", p, pos + 4)
            if pos + 8 + size > end:
                raise ValueError("AVI chunk overruns container")
            if fourcc == b"LIST":
                if p[pos + 8 : pos + 12] in (b"hdrl", b"strl"):
                    walk(pos + 12, pos + 8 + size)
            elif fourcc == b"avih" and size >= 40:
                uspf, frames = (
                    struct.unpack_from("<I", p, pos + 8)[0],
                    struct.unpack_from("<I", p, pos + 8 + 16)[0],
                )
                w, h = struct.unpack_from("<II", p, pos + 8 + 32)
            elif fourcc == b"strh" and size >= 8:
                if p[pos + 8 : pos + 12] == b"vids":
                    codec = p[pos + 12 : pos + 16].decode("ascii", "replace").lower()
            pos += 8 + size + (size % 2)

    walk(12, min(len(p), 8 + struct.unpack_from("<I", p, 4)[0]))
    if w is None or codec is None:
        raise ValueError("AVI missing avih/vids headers")
    dur = frames * uspf // 1000 if frames and uspf else None
    return ("riff-avi", codec, w, h, dur)


def _probe_mp4(p: bytes):
    """ISO BMFF box walk: ftyp sanity, mvhd timescale+duration, first
    video trak's tkhd dims, stsd sample-entry fourcc as codec."""
    if len(p) < 12 or p[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    timescale = duration = w = h = None
    codec = None

    def boxes(start, end):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", p, pos)
            typ = p[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                size = struct.unpack_from(">Q", p, pos + 8)[0]
                hdr = 16
            elif size == 0:  # to end of file
                size = end - pos
                hdr = 8
            else:
                hdr = 8
            if size < hdr or pos + size > end:
                raise ValueError("mp4 box overruns container")
            yield typ, pos + hdr, pos + size
            pos += size

    def walk(start, end):
        nonlocal timescale, duration, w, h, codec
        for typ, b0, b1 in boxes(start, end):
            if typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(b0, b1)
            elif typ == b"mvhd":
                ver = p[b0]
                if ver == 1:
                    timescale = struct.unpack_from(">I", p, b0 + 20)[0]
                    duration = struct.unpack_from(">Q", p, b0 + 24)[0]
                else:
                    timescale, duration = struct.unpack_from(">II", p, b0 + 12)
            elif typ == b"tkhd" and w is None:
                ver = p[b0]
                off = b0 + (88 if ver == 1 else 76)
                # 16.16 fixed-point width/height at the end of tkhd
                wf, hf = struct.unpack_from(">II", p, off)
                if wf and hf:
                    w, h = wf >> 16, hf >> 16
            elif typ == b"stsd" and codec is None:
                n = struct.unpack_from(">I", p, b0 + 4)[0]
                if n >= 1:
                    codec = (
                        p[b0 + 12 : b0 + 16].decode("ascii", "replace").lower()
                    )

    walk(0, len(p))
    if timescale is None or codec is None:
        raise ValueError("mp4 missing mvhd/stsd boxes")
    dur = duration * 1000 // timescale if timescale else None
    return ("mp4", codec, w, h, dur)


_SNIFFERS = (
    _probe_png,
    _probe_bmp,
    _probe_jpeg,
    _probe_wav,
    _probe_avi,
    _probe_mp4,
)


def probe_media(payload: bytes):
    """Sniff ``payload`` and return (container, codec, width, height,
    duration_ms) — width/height None for audio, duration None for still
    images. Raises ValueError when no known container matches."""
    for sniff in _SNIFFERS:
        try:
            return sniff(payload)
        except (ValueError, struct.error, IndexError):
            # A sniffer that blew up past its magic check must not abort
            # the whole probe: magic prefixes overlap (RIFF serves both
            # WAV and AVI, and _probe_wav runs first), so a truncated
            # RIFF/AVI header would otherwise be reported as
            # malformed-by-WAV instead of probed as AVI (ADVICE r4).
            continue
    raise ValueError("unknown media container")


def encode_mp4_stub(
    w: int, h: int, duration_ms: int, codec: bytes = b"avc1"
) -> bytes:
    """Minimal metadata-only ISO BMFF: ftyp + moov(mvhd, trak(tkhd,
    mdia(minf(stbl(stsd))))) with timescale 1000 — enough structure for
    any standards-following prober; carries no samples (this container
    cannot be frame-decoded here anyway, see module docstring)."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">III4x", 0, 0, 1)  # times, track id
        + struct.pack(">I8x", duration_ms)
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    sample_entry = struct.pack(">I", 16) + codec + b"\x00" * 8
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + sample_entry)
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov
