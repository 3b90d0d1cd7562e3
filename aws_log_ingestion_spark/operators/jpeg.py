"""Baseline JPEG codec in pure numpy — no PIL/libjpeg in this container.

Decoder: sequential baseline DCT JPEGs (SOF0) — marker walk, canonical
Huffman entropy decode (with 0xFF00 byte-stuffing and FFD0-D7 restart
markers), dequantize, inverse zigzag, exact float64 2-D IDCT, chroma
upsample (sample replication) and JFIF YCbCr->RGB. Progressive (SOF2),
arithmetic-coded and 12-bit JPEGs raise ValueError so callers' per-row
fallback isolation keeps working (`multimodal.decoded_features`).

Encoder: baseline 4:4:4 or 4:2:0 with the Annex-K example quantization
(quality-scaled, IJG formula) and Huffman tables — exists so tests can
round-trip without any external codec. JPEG is lossy, so tests assert
bounded pixel error rather than equality, plus an exact hand-built
DC-only fixture whose expected pixels come straight from spec arithmetic
(IDCT of a DC-only block is the constant DC*Q/8 + 128).

Entropy decode is pure Python but not naive: a 16-bit-lookahead LUT
(cached per Huffman spec — real corpora reuse the libjpeg/Annex-K
defaults) replaces the per-bit tree walk, the bit accumulator lives in
loop locals with consumed bits masked off (an unmasked accumulator
grows into a big-int and turns every shift O(stream length)), and
the dequantize + de-zigzag + IDCT runs BATCHED per component (one
(N, 64) array and one broadcast matmul instead of 4-6 numpy calls per
block). Cumulative 3.9-4.5x over the per-bit reader, bit-identical:
~580 img/s/core on textured 64x64 4:2:0, ~210 on dense-noise 4:4:4,
~21 on 256x256 q75. The lockstep batch decoder (`decode_jpeg_batch`)
amortizes the remaining per-symbol overhead across a whole batch, and
restart markers extend that to SINGLE images: every FFD0-D7 segment is
an independent entropy stream (DC predictors reset), so a DRI image
fans out into ceil(n_mcu/ri) lockstep lanes — measured 2.0-2.2x over
the scalar loop for one 768x768 image at >=576 lanes, neutral below
the crossover (which is exactly how production decoders parallelize
huge scans). Still fixture-grade next to libjpeg-turbo: a
production 100 TB image scan would put a real codec library on the
executors and keep the identical mapInPandas plumbing
(`multimodal.decode_media` dispatch, per-row error isolation).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K (K.1/K.2) example luminance/chrominance quantization tables,
# in natural (row-major) order.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 example Huffman specs: (bits[1..16] counts, symbol values).
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    # fmt: off
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
    # fmt: on
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    # fmt: off
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
    # fmt: on
)

# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
def _zigzag_order():
    # diagonal s = r+c; odd diagonals run top-right -> bottom-left
    # (r ascending), even diagonals bottom-left -> top-right (c ascending)
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZIGZAG = _zigzag_order()

#: ZIGZAG_FLAT[k] = flat (row*8+col) position of zigzag coefficient k —
#: lets the scan decoder de-zigzag a whole block in one fancy-index store
ZIGZAG_FLAT = np.array([r * 8 + c for r, c in ZIGZAG], dtype=np.int64)

# Orthonormal DCT-II basis: IDCT(F) = A.T @ F @ A with the scaled basis.
def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    mat = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    mat[0, :] = np.sqrt(1.0 / 8.0)
    return mat


DCT_M = _dct_matrix()


def _build_huffman(spec) -> dict:
    """Canonical Huffman per the spec's (counts-by-length, symbols):
    {(length, code): symbol}."""
    counts, symbols = spec
    table, code, it = {}, 0, iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


_LUT_CACHE: dict = {}


def _build_huffman_lut(spec):
    """16-bit-lookahead decode tables: LUT[next16bits] = (symbol,
    code_length), with code_length 0 marking an invalid prefix. A
    canonical code of length L owns the 2^(16-L) table slots whose top
    L bits equal it, so one list index replaces the per-bit tree walk.
    Cached by the table spec — real corpora overwhelmingly reuse the
    libjpeg/Annex-K default tables, so across a 5k-image batch each LUT
    builds once (a fresh build is ~1 ms, comparable to decoding one
    small image)."""
    key = (bytes(spec[0]), bytes(spec[1]))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    counts, symbols = spec
    sym = np.zeros(1 << 16, dtype=np.int16)
    lng = np.zeros(1 << 16, dtype=np.uint8)
    code, it = 0, iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            s = next(it)
            start = code << (16 - length)
            end = (code + 1) << (16 - length)
            sym[start:end] = s
            lng[start:end] = length
            code += 1
        code <<= 1
    # lists for the scalar loop (python list indexing beats np scalar
    # indexing ~3x), np arrays for the batched lockstep decoder
    lut = (sym.tolist(), lng.tolist(), sym, lng)
    if len(_LUT_CACHE) < 64:  # bounded; 4 tables/image, specs recur
        _LUT_CACHE[key] = lut
    return lut


#: decompression-bomb cap on claimed SOF pixels (16.7M = e.g. 4096x4096).
#: With it (plus the 1-or-3-component and 1-4 sampling-factor guards in
#: `_parse_jpeg`) the worst-case coefficient footprint a crafted header
#: can demand is ~200 MB in the lockstep batch path — under the
#: `_LOCKSTEP_ZZ_BYTES` slice cap — instead of tens of GB. Far above any
#: fixture this codec serves; a real camera corpus swaps in a codec lib
#: at the `decode_media` dispatch anyway (BENCH/plans.md).
_MAX_DECODE_PIXELS = 1 << 24


def _scan_lanes(info: dict) -> int:
    """Independent entropy lanes in one scan: ceil(n_mcu / per_seg).
    Restart markers reset the DC predictors, so each restart segment
    decodes independently — a single DRI image fans out into this many
    lockstep lanes."""
    comps = info["scan"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcu = (-(-info["sof"]["w"] // (8 * hmax))) * (
        -(-info["sof"]["h"] // (8 * vmax))
    )
    return -(-n_mcu // (info["ri"] or n_mcu))


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG to an (H, W, 3) uint8 RGB array
    ((H, W, 1) for single-component grayscale). ValueError on anything
    that isn't 8-bit baseline Huffman (progressive, arithmetic, 12-bit,
    truncated streams) — including arbitrary malformed bytes, so the
    media operators' per-row fallback isolation holds. A single image
    whose restart interval yields >= ``_LOCKSTEP_MIN`` independent
    segments decodes through the lockstep lanes (bit-identical; any
    lane failure falls back to the scalar decoder's exact error)."""
    try:
        info = _parse_jpeg(payload)
        if info["ri"] and _scan_lanes(info) >= _LOCKSTEP_MIN:
            out = decode_jpeg_batch([payload])[0]
            if isinstance(out, Exception):
                raise out
            return out
        return _decode_scan(
            payload,
            info["data_start"],
            info["sof"],
            info["scan"],
            info["qt"],
            info["huff"],
            info["ri"],
        )
    except (struct.error, IndexError, StopIteration) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from None


def _decode_jpeg(payload: bytes):
    p = _parse_jpeg(payload)
    return _decode_scan(
        payload, p["data_start"], p["sof"], p["scan"], p["qt"], p["huff"], p["ri"]
    )


def _parse_jpeg(payload: bytes) -> dict:
    """Marker walk up to (and including) SOS: tables + frame/scan layout.
    Shared by the scalar and batched decoders."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    sof = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                    i += 65
                else:  # 16-bit table
                    tbl = np.frombuffer(body, ">u2", 64, i + 1).astype(np.int64)
                    i += 129
                qt[tid] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline (extended seq ok)
            depth, h, w, ncomp = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if depth != 8:
                raise ValueError(f"unsupported JPEG bit depth {depth}")
            # SOF fields are UNTRUSTED (ADVICE-r5 mp4-stsz class): the
            # decoders size coefficient stores from h/w/sampling before
            # any entropy data is read, so crafted headers must fail on
            # the ValueError path here, not as MemoryError (a ~200-byte
            # payload claiming 65535x65535 would drive a multi-GB zz
            # allocation in the lockstep batch path) or ZeroDivisionError
            # (all-zero sampling factors reach the ceil-div below) —
            # neither is caught by the media operators' per-row fallback.
            if h == 0 or w == 0:
                raise ValueError("JPEG frame has a zero dimension")
            if h * w > _MAX_DECODE_PIXELS:
                raise ValueError(
                    f"JPEG frame {w}x{h} exceeds the decoder pixel cap "
                    f"({_MAX_DECODE_PIXELS})"
                )
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if any(not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4) for c in comps):
                raise ValueError("JPEG sampling factors out of range (T.81: 1-4)")
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding process (not baseline)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_huffman_lut((counts, symbols))
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in sof["comps"] if x["id"] == cs)
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 0x0F})
            # Baseline guard (ADVICE r4): a legal multi-scan baseline JPEG
            # (first SOS covers a subset of the frame components) would
            # otherwise decode to a silently-wrong partial image, and a
            # single-component scan with sampling factors > 1 uses the
            # spec's non-interleaved one-block-per-MCU layout, not the
            # interleaved tiling below — both must hit the caller's
            # per-row fallback instead.
            if len(scan) != len(sof["comps"]):
                raise ValueError("unsupported JPEG: scan does not cover all frame components")
            if ns == 1 and (scan[0]["h"] > 1 or scan[0]["v"] > 1):
                raise ValueError("unsupported JPEG: non-interleaved single-component scan")
            data_start = pos + 2 + seg_len
            return {
                "data_start": data_start,
                "sof": sof,
                "scan": scan,
                "qt": qt,
                "huff": huff,
                "ri": restart_interval,
            }
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOS scan")


def _destuff(payload: bytes, start: int) -> list:
    """Entropy-data destuffing: 0xFF00 -> 0xFF; FFD0-D7 restart markers
    split the stream into independent segments; any other marker ends
    the scan. Vectorized: only the (sparse) 0xFF positions are walked in
    Python — a byte-at-a-time walk was ~33% of batched decode time."""
    arr = np.frombuffer(payload, np.uint8, len(payload) - start, start)
    n = len(arr)
    ffs = np.nonzero(arr == 0xFF)[0]
    segments: list = []
    parts: list = []  # (lo, hi) clean-byte slices of the current segment
    lo = 0
    end_at = n
    for i in ffs:
        i = int(i)
        if i < lo:
            continue  # the 0x00/0xDn consumed by a previous pair
        nxt = int(arr[i + 1]) if i + 1 < n else 0xD9
        if nxt == 0x00:
            parts.append((lo, i + 1))  # keep the 0xFF, drop the 0x00
            lo = i + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: new entropy segment
            parts.append((lo, i))
            segments.append(b"".join(arr[a:b].tobytes() for a, b in parts))
            parts = []
            lo = i + 2
        else:  # any other marker ends the scan (EOI)
            end_at = i
            break
    parts.append((lo, max(lo, end_at)))
    segments.append(b"".join(arr[a:b].tobytes() for a, b in parts))
    return segments


def _decode_scan(payload, start, sof, scan, qt, huff, restart_interval):
    segments = _destuff(payload, start)

    h, w, comps = sof["h"], sof["w"], scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coeff_rows: list = [[] for _ in comps]  # per-component zigzag rows

    try:
        tabs = [
            (huff[(0, c["dc"])], huff[(1, c["ac"])], qt[c["tq"]]) for c in comps
        ]
    except KeyError:
        raise ValueError("JPEG scan references missing table")

    n_mcu = mcus_x * mcus_y
    per_seg = restart_interval or n_mcu
    mcu = 0
    # The entropy loop runs symbol-at-a-time by nature (each Huffman
    # code's length is only known after decoding it), so the Python win
    # is eliminating per-symbol CALL overhead: the bit accumulator
    # (acc/nbits/pos) lives in locals and the 16-bit-lookahead LUT is
    # indexed inline — zero method dispatch per symbol.
    # EXTEND (F.2.2.1) is likewise inlined: a `size`-bit magnitude v
    # maps to v - (2^size - 1) when its top bit is 0, else to v.
    for seg in segments:
        if mcu >= n_mcu:
            break
        n_seg = len(seg)
        pos = acc = nbits = 0
        pred = [0] * len(comps)  # DC predictors reset at restarts
        for _ in range(min(per_seg, n_mcu - mcu)):
            for ci, c in enumerate(comps):
                dc_tab, ac_tab, _quant = tabs[ci]
                dc_sym, dc_len = dc_tab[0], dc_tab[1]
                ac_sym, ac_len = ac_tab[0], ac_tab[1]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0] * 64
                        # ---- DC coefficient ----
                        if nbits < 16:
                            acc &= (1 << nbits) - 1
                            while nbits < 16 and pos < n_seg:
                                acc = (acc << 8) | seg[pos]
                                pos += 1
                                nbits += 8
                        idx = (
                            (acc >> (nbits - 16)) & 0xFFFF
                            if nbits >= 16
                            else (acc << (16 - nbits)) & 0xFFFF
                        )
                        length = dc_len[idx]
                        if length == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        if length > nbits:
                            raise ValueError("JPEG entropy stream exhausted")
                        nbits -= length
                        size = dc_sym[idx]
                        if size:
                            if nbits < size:
                                acc &= (1 << nbits) - 1
                                while nbits < size and pos < n_seg:
                                    acc = (acc << 8) | seg[pos]
                                    pos += 1
                                    nbits += 8
                                if nbits < size:
                                    raise ValueError(
                                        "JPEG entropy stream exhausted"
                                    )
                            nbits -= size
                            v = (acc >> nbits) & ((1 << size) - 1)
                            if v < (1 << (size - 1)):
                                v -= (1 << size) - 1
                            pred[ci] += v
                        zz[0] = pred[ci]
                        # ---- AC coefficients ----
                        k = 1
                        while k < 64:
                            if nbits < 16:
                                acc &= (1 << nbits) - 1
                                while nbits < 16 and pos < n_seg:
                                    acc = (acc << 8) | seg[pos]
                                    pos += 1
                                    nbits += 8
                            idx = (
                                (acc >> (nbits - 16)) & 0xFFFF
                                if nbits >= 16
                                else (acc << (16 - nbits)) & 0xFFFF
                            )
                            length = ac_len[idx]
                            if length == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            if length > nbits:
                                raise ValueError("JPEG entropy stream exhausted")
                            nbits -= length
                            rs = ac_sym[idx]
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            if nbits < size:
                                acc &= (1 << nbits) - 1
                                while nbits < size and pos < n_seg:
                                    acc = (acc << 8) | seg[pos]
                                    pos += 1
                                    nbits += 8
                                if nbits < size:
                                    raise ValueError(
                                        "JPEG entropy stream exhausted"
                                    )
                            nbits -= size
                            v = (acc >> nbits) & ((1 << size) - 1)
                            if v < (1 << (size - 1)):
                                v -= (1 << size) - 1
                            zz[k] = v
                            k += 1
                        coeff_rows[ci].append(zz)
            mcu += 1
    if mcu < n_mcu:
        raise ValueError("truncated JPEG entropy data")

    zz_by_comp = [
        np.array(coeff_rows[ci], dtype=np.float64) for ci in range(len(comps))
    ]
    return _assemble(
        zz_by_comp, [t[2] for t in tabs], comps, mcus_x, mcus_y, h, w, hmax, vmax
    )


def _assemble(zz_by_comp, quants, comps, mcus_x, mcus_y, h, w, hmax, vmax):
    """Dequantize + de-zigzag + IDCT + upsample + color — BATCHED per
    component: one (N, 64) array and one broadcast matmul per component
    instead of 4-6 numpy calls per block (the per-block dispatch
    overhead was ~30% of decode time). Block rows arrive in MCU-major
    (my, mx, by, bx) order, so the plane is a reshape/transpose of the
    batch — no scatter loop. Shared by the scalar and batched decoders."""
    planes = [None] * len(comps)
    for ci, c in enumerate(comps):
        v_, h_ = c["v"], c["h"]
        zzs = zz_by_comp[ci] * quants[ci]
        blocks = np.zeros((len(zzs), 64), dtype=np.float64)
        blocks[:, ZIGZAG_FLAT] = zzs
        pix = DCT_M.T @ blocks.reshape(-1, 8, 8) @ DCT_M + 128.0
        planes[ci] = (
            pix.reshape(mcus_y, mcus_x, v_, h_, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * v_ * 8, mcus_x * h_ * 8)
        )

    # Upsample each plane to full resolution by sample replication.
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Batched lockstep decoder: one numpy "VM" decodes a whole batch of
# images in parallel — per iteration, EVERY in-flight image advances by
# one Huffman symbol (with its magnitude bits fused in when already
# buffered). The per-symbol Python/bytecode overhead — the scalar
# decoder's floor — amortizes across the batch: ~60 vector ops per
# iteration serve B images at once, so per-image cost falls ~B/constant
# until numpy element work dominates. Bit-identical to the scalar path
# (shared parse/destuff/assembly; differential property tests), and any
# image the lockstep rejects is re-decoded by the scalar decoder, so
# error behavior is EXACTLY the scalar decoder's.

_MASK = (np.int64(1) << np.arange(48, dtype=np.int64)) - 1


def _prep_image(payload: bytes, info: dict) -> dict:
    """Per-image lockstep prep: destuffed stream + geometry + tables."""
    sof, scan, qt, huff = info["sof"], info["scan"], info["qt"], info["huff"]
    comps = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-sof["w"] // (8 * hmax))
    mcus_y = -(-sof["h"] // (8 * vmax))
    try:
        tabs = [
            (huff[(0, c["dc"])], huff[(1, c["ac"])], qt[c["tq"]]) for c in comps
        ]
    except KeyError:
        raise ValueError("JPEG scan references missing table")
    segments = _destuff(payload, info["data_start"])
    n_mcu = mcus_x * mcus_y
    return {
        "key": tuple((c["h"], c["v"]) for c in comps),
        "comps": comps,
        "tabs": tabs,
        "segments": segments,
        "n_mcu": n_mcu,
        "per_seg": info["ri"] or n_mcu,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "h": sof["h"],
        "w": sof["w"],
        "hmax": hmax,
        "vmax": vmax,
    }


#: lockstep-vs-scalar crossover, measured on this box (varied 16x16 /
#: 64x64 / 256x256 corpora): batch width 128 decodes at ~0.5-0.9x the
#: scalar rate (numpy per-op dispatch dominates narrow vectors), ~1.0x
#: at 256, 1.5-2.3x at >=512. Below this width the scalar loop wins.
_LOCKSTEP_MIN = 256

#: soft cap on the lockstep coefficient store (int32 zz matrix) per
#: slice — bounds working-set memory when a 10k-row Arrow batch of
#: large images lands in one sampling-structure group
_LOCKSTEP_ZZ_BYTES = 1 << 28


def decode_jpeg_batch(payloads) -> list:
    """Decode a batch of baseline JPEGs; returns a list aligned with
    ``payloads`` holding either the decoded (H, W, C) uint8 array or the
    ValueError the scalar ``decode_jpeg`` raises for that payload.
    Results are bit-identical to per-payload ``decode_jpeg`` calls.
    Images grouped by sampling structure decode in vectorized lockstep
    when the group is wide enough to beat the scalar loop
    (``_LOCKSTEP_MIN``); narrow groups take the scalar path."""
    results: list = [None] * len(payloads)
    groups: dict = {}
    for i, p in enumerate(payloads):
        p = bytes(p)
        try:
            prep = _prep_image(p, _parse_jpeg(p))
        except ValueError as e:
            results[i] = e
            continue
        except (struct.error, IndexError, StopIteration) as e:
            results[i] = ValueError(f"malformed JPEG: {e}")
            continue
        groups.setdefault(prep["key"], []).append((i, prep, p))
    for items in groups.values():
        # eligibility counts LANES, not images: restart segments are
        # independent streams, so one DRI image contributes
        # ceil(n_mcu/per_seg) lanes of lockstep width
        lanes = sum(
            -(-p["n_mcu"] // p["per_seg"]) for _i, p, _raw in items
        )
        if lanes < _LOCKSTEP_MIN:  # below the measured crossover
            for i, _prep, p in items:
                try:
                    results[i] = _decode_jpeg(p)
                except (struct.error, IndexError, StopIteration) as e:
                    results[i] = ValueError(f"malformed JPEG: {e}")
                except ValueError as e:
                    results[i] = e
            continue
        # slice very wide groups so the zz store stays memory-bounded;
        # near-even slices keep every slice at lockstep-worthy width
        bpm = sum(h * v for (h, v) in items[0][1]["key"])
        total = sum(p["n_mcu"] for _i, p, _raw in items) * bpm * 64 * 4
        k = max(1, -(-total // _LOCKSTEP_ZZ_BYTES))
        step = -(-len(items) // k)
        for c0 in range(0, len(items), step):
            _decode_group(items[c0 : c0 + step], results)
    return results


def decode_jpeg_frames(blobs) -> list:
    """Decode an ordered list of JPEG frame payloads (e.g. the samples of
    one Motion-JPEG video), raising the first frame's error exactly as a
    sequential ``decode_jpeg`` loop would. Video frames share tables and
    geometry, so they lockstep perfectly through ``decode_jpeg_batch``
    when the clip is long enough to clear the measured crossover."""
    if not blobs:
        return []
    if len(blobs) < _LOCKSTEP_MIN:
        # short clips: the scalar loop wins UNLESS restart lanes
        # multiply the effective width past the crossover (frames of
        # one clip share geometry/tables, so the first frame's lane
        # count stands for all)
        try:
            lanes1 = _scan_lanes(_parse_jpeg(bytes(blobs[0])))
        except (ValueError, struct.error, IndexError, StopIteration):
            lanes1 = 1
        if lanes1 * len(blobs) < _LOCKSTEP_MIN:
            return [decode_jpeg(b) for b in blobs]
    outs = decode_jpeg_batch(blobs)
    for o in outs:
        if isinstance(o, Exception):
            raise o
    return outs


def _decode_group(items, results) -> None:
    """Lockstep-decode one group of images sharing a sampling structure."""
    B = len(items)
    preps = [it[1] for it in items]
    comps0 = preps[0]["comps"]
    ncomp = len(comps0)
    # slot -> component map (group-constant: same sampling structure)
    slot_ci_l = []
    for ci, c in enumerate(comps0):
        slot_ci_l += [ci] * (c["v"] * c["h"])
    slot_ci = np.array(slot_ci_l, dtype=np.int64)
    bpm = len(slot_ci_l)

    # ---- stacked entropy streams (per-image concatenated segments)
    seg_lens = [[len(s) for s in p["segments"]] for p in preps]
    tot_lens = [sum(ls) for ls in seg_lens]
    L = max(tot_lens) + 2  # +2: refill gathers pos/pos+1 unguarded
    data = np.zeros((B, L), dtype=np.uint8)
    max_nseg = max(len(ls) for ls in seg_lens)
    seg_start = np.zeros((B, max_nseg), dtype=np.int64)
    seg_end = np.zeros((B, max_nseg), dtype=np.int64)
    n_segs = np.zeros(B, dtype=np.int64)
    for r, p in enumerate(preps):
        off = 0
        for si, s in enumerate(p["segments"]):
            seg_start[r, si] = off
            off += len(s)
            seg_end[r, si] = off
        data[r, : off] = np.frombuffer(b"".join(p["segments"]), dtype=np.uint8)
        n_segs[r] = len(p["segments"])

    # ---- stacked Huffman LUTs (dedup by array identity: the spec cache
    # hands identical specs the same arrays)
    tab_rows: dict = {}
    stack_sym: list = []

    def row_of(tab, is_ac):
        rid = (id(tab[2]), is_ac)
        hit = tab_rows.get(rid)
        if hit is None:
            hit = len(stack_sym)
            tab_rows[rid] = hit
            # pre-split symbol semantics INTO the LUT row — one gather
            # yields (run << 10) | (size << 5) | code_len directly:
            # DC symbols ARE the size (run 0); AC symbols are run<<4|size
            s = tab[2].astype(np.int64)
            if is_ac:
                packed = ((s >> 4) << 10) | ((s & 15) << 5) | tab[3]
            else:
                packed = (s << 5) | tab[3]
            stack_sym.append(packed)
        return hit

    dc_row = np.zeros((B, ncomp), dtype=np.int64)
    ac_row = np.zeros((B, ncomp), dtype=np.int64)
    for r, p in enumerate(preps):
        for ci in range(ncomp):
            dc_row[r, ci] = row_of(p["tabs"][ci][0], 0)
            ac_row[r, ci] = row_of(p["tabs"][ci][1], 1)
    pak_all = np.stack(stack_sym)

    # ---- coefficient store: one (total_blocks, 64) matrix, MCU-major
    n_mcu = np.array([p["n_mcu"] for p in preps], dtype=np.int64)
    per_seg = np.array([p["per_seg"] for p in preps], dtype=np.int64)
    base = np.zeros(B, dtype=np.int64)
    np.cumsum(n_mcu[:-1] * bpm, out=base[1:])
    # int32 coefficients (4x smaller working set than int64): AC values
    # are <= 2^15; DC predictors are guarded against int32 overflow in
    # the write path (overflow -> scalar fallback, keeping exactness)
    zz = np.zeros((int((n_mcu * bpm).sum()), 64), dtype=np.int32)

    # ---- lockstep state, COMPACTED: one lane per (image, restart
    # segment) — restart markers reset the DC predictors, so every
    # restart segment is an independent entropy stream and a single DRI
    # image fans out into ceil(n_mcu/per_seg) concurrent lanes (that is
    # what makes a lone large DRI image lockstep-eligible). All
    # iteration math runs on whole arrays (no per-iteration gathers of
    # an active subset — that cost ~2x). `lrow` maps a compacted lane
    # back to its group row; arrays shrink only when a lane finishes or
    # its image fails.
    failed = np.zeros(B, dtype=bool)
    s_need = -(-n_mcu // per_seg)  # segments the scalar decoder consumes
    # fewer segments on the wire than lanes: the scalar redecode below
    # raises the exact "truncated JPEG entropy data" error
    failed |= n_segs < s_need
    lrow_l: list = []
    segj_l: list = []
    for r in range(B):
        if failed[r]:
            continue
        lrow_l += [r] * int(s_need[r])
        segj_l += range(int(s_need[r]))
    lrow = np.array(lrow_l, dtype=np.int64)
    seg_j = np.array(segj_l, dtype=np.int64)
    L = lrow.size
    pos = seg_start[lrow, seg_j]
    end = seg_end[lrow, seg_j]
    mcu = seg_j * per_seg[lrow]  # this lane's first MCU
    lane_end = np.minimum(mcu + per_seg[lrow], n_mcu[lrow])
    blk = base[lrow] + mcu * bpm
    acc = np.zeros(L, dtype=np.int64)
    nbits = np.zeros(L, dtype=np.int64)
    slot = np.zeros(L, dtype=np.int64)
    k = np.zeros(L, dtype=np.int64)
    pred = np.zeros((L, ncomp), dtype=np.int64)  # per-lane: resets at RST
    one = np.int64(1)

    # flat per-(image, slot, dc/ac) LUT-row select: one gather per symbol
    srow = np.empty((B, bpm, 2), dtype=np.int64)
    for ci0 in range(bpm):
        srow[:, ci0, 0] = dc_row[:, slot_ci_l[ci0]]
        srow[:, ci0, 1] = ac_row[:, slot_ci_l[ci0]]
    srow = srow.reshape(-1)
    lrow2 = lrow * (bpm * 2)

    while lrow.size:
        # one mask per iteration re-establishes the "acc holds exactly
        # nbits bits" invariant (the scalar masks before each refill);
        # the refill below then appends real bits, keeping it exact —
        # and bounding acc under 2^47 so shifts never overflow int64
        acc = acc & _MASK[nbits]
        # ---- refill to >=16 buffered bits, never past the segment end
        # (.any() gates: lockstepped images hit refills together, so
        # whole iterations skip the refill block entirely)
        nf = nbits < 16
        if nf.any():
            b1ok = nf & (pos < end)
            acc = np.where(b1ok, (acc << 8) | data[lrow, pos], acc)
            nbits = nbits + b1ok * 8
            pos = pos + b1ok
            b2ok = (nbits < 16) & (pos < end)
            acc = np.where(b2ok, (acc << 8) | data[lrow, pos], acc)
            nbits = nbits + b2ok * 8
            pos = pos + b2ok
        # branch-free 16-bit lookahead, exact for short tail reads too
        idxv = (acc << 16) >> nbits

        # ---- Huffman symbol (every in-flight image decodes one):
        # one LUT gather yields run/size/length pre-split
        isac = k != 0
        pak = pak_all[srow[lrow2 + slot + slot + isac], idxv]
        ln = pak & 31
        bad = (ln == 0) | (ln > nbits)  # invalid code / stream exhausted
        size = (pak >> 5) & 31
        if bad.any():
            ln = np.where(bad, 0, ln)
            size = np.where(bad, 0, size)
        nbits = nbits - ln
        run = pak >> 10

        done_blk = np.zeros(lrow.size, dtype=bool)
        sz0 = size == 0
        if sz0.any():
            # AC size==0: EOB (run<15) or ZRL (run==15, skip 16 zeros)
            az = isac & sz0 & ~bad
            if az.any():
                zrl = az & (run == 15)
                k = np.where(zrl, k + 16, k)
                done_blk |= (zrl & (k >= 64)) | (az & (run != 15))
            # DC size==0: the coefficient is the unchanged predictor
            dz = ~isac & sz0 & ~bad
            if dz.any():
                i_dz = np.nonzero(dz)[0]
                ci_dz = slot_ci[slot[i_dz]]
                zz[blk[i_dz], 0] = pred[i_dz, ci_dz]
                k[i_dz] = 1
        # size>0: zero-run advance, overflow check
        m = size > 0
        k = k + run * m
        over = m & (k > 63)  # JPEG AC run overflow
        if over.any():
            bad |= over
            m &= ~over

        # ---- magnitude bits: refill (same segment only) + extract, in
        # the same iteration — matching the scalar's inline RECEIVE+EXTEND
        if m.any():
            need = m & (nbits < size)
            if need.any():
                b1ok = need & (pos < end)
                acc = np.where(b1ok, (acc << 8) | data[lrow, pos], acc)
                nbits = nbits + b1ok * 8
                pos = pos + b1ok
                need = m & (nbits < size)
                b2ok = need & (pos < end)
                acc = np.where(b2ok, (acc << 8) | data[lrow, pos], acc)
                nbits = nbits + b2ok * 8
                pos = pos + b2ok
                short = m & (nbits < size)  # entropy stream exhausted
                if short.any():
                    bad |= short
                    m &= ~short
            nb2 = np.maximum(nbits - size, 0)
            # value bits sit below the post-symbol nbits, so masking with
            # _MASK[size] suffices even though acc may hold refill bits
            # above them; acc is re-masked at the next iteration's top
            val = (acc >> nb2) & _MASK[size]
            val = np.where(
                val < (one << np.maximum(size - 1, 0)), val - _MASK[size], val
            )
            nbits = np.where(m, nb2, nbits)
            i_m = np.nonzero(m)[0]
            mac = isac[i_m]
            i_d = i_m[~mac]
            if i_d.size:
                ci_d = slot_ci[slot[i_d]]
                pr = pred[i_d, ci_d] + val[i_d]
                ovf = np.abs(pr) > 0x7FFFFFFF  # int32 zz store would wrap
                if ovf.any():
                    bad[i_d[ovf]] = True  # -> exact scalar fallback
                    i_d, pr = i_d[~ovf], pr[~ovf]
                    ci_d = ci_d[~ovf]
                pred[i_d, ci_d] = pr
                zz[blk[i_d], 0] = pr
                k[i_d] = 1
            i_a = i_m[mac]
            if i_a.size:
                zz[blk[i_a], k[i_a]] = val[i_a]
                k[i_a] += 1
                done_blk[i_a] = k[i_a] >= 64

        done_blk &= ~bad
        finished = np.zeros(lrow.size, dtype=bool)

        # ---- block/MCU advance for completed blocks; a lane finishes
        # at its own lane_end (its restart segment's last MCU) — the
        # scalar's mid-stream segment switch no longer exists, each
        # lane owns exactly one segment
        if done_blk.any():
            i_b = np.nonzero(done_blk)[0]
            k[i_b] = 0
            slot[i_b] += 1
            md = i_b[slot[i_b] == bpm]
            if md.size:
                slot[md] = 0
                mcu[md] += 1
                finished[md[mcu[md] == lane_end[md]]] = True
            blk[i_b] = base[lrow[i_b]] + mcu[i_b] * bpm + slot[i_b]

        # ---- compact away finished lanes and failed images (a bad
        # lane fails its whole image, so its sibling lanes drop too)
        if bad.any() or finished.any():
            failed[lrow[bad]] = True
            keep = ~(bad | finished | failed[lrow])
            lrow, pos, end, acc, nbits, mcu, lane_end, slot, k, blk = (
                lrow[keep], pos[keep], end[keep], acc[keep], nbits[keep],
                mcu[keep], lane_end[keep], slot[keep], k[keep], blk[keep],
            )
            pred = pred[keep]
            lrow2 = lrow2[keep]

    # ---- assemble successes (batched across images sharing geometry —
    # per-image IDCT calls on small planes are dispatch-bound);
    # scalar-redecode failures (exact errors, and a safety net: a
    # lockstep false-negative still decodes correctly)
    geo: dict = {}
    for r, (i, p, raw) in enumerate(items):
        if failed[r]:
            try:
                results[i] = _decode_jpeg(raw)
            except (struct.error, IndexError, StopIteration) as e:
                results[i] = ValueError(f"malformed JPEG: {e}")
            except ValueError as e:
                results[i] = e
            continue
        geo.setdefault(
            (p["mcus_x"], p["mcus_y"], p["h"], p["w"], p["hmax"], p["vmax"]),
            [],
        ).append((r, i, p))
    for (gmx, gmy, gh, gw, ghm, gvm), full_lst in geo.items():
        # bound the float64 temporaries (~200 KB/image at 64x64): chunks
        # keep the assemble working set cache-friendly at any batch size
        chunk = max(1, (1 << 23) // max(1, gmx * gmy * bpm * 64 * 8))
        for c0 in range(0, len(full_lst), chunk):
            lst = full_lst[c0 : c0 + chunk]
            _assemble_subgroup(
                lst, zz, base, bpm, slot_ci, results,
                gmx, gmy, gh, gw, ghm, gvm,
            )


def _assemble_subgroup(
    lst, zz, base, bpm, slot_ci, results, gmx, gmy, gh, gw, ghm, gvm
):
    """Batched assemble for images sharing one geometry (see
    _decode_group): one dequantize/IDCT/upsample/color pass over the
    whole stack instead of per-image dispatch."""
    if lst:
        G = len(lst)
        nm = gmx * gmy
        starts = np.array([base[r] for r, _i, _p in lst])
        if (np.diff(starts) == nm * bpm).all():  # contiguous: no gather
            big = zz[starts[0] : starts[0] + G * nm * bpm]
        else:
            big = zz[
                np.concatenate(
                    [np.arange(s, s + nm * bpm) for s in starts]
                )
            ]
        big = big.reshape(G, nm, bpm, 64)
        comps = lst[0][2]["comps"]
        full = []
        for ci, c in enumerate(comps):
            v_, h_ = c["v"], c["h"]
            q_stack = np.stack([p["tabs"][ci][2] for _r, _i, p in lst])
            zzc = big[:, :, slot_ci == ci, :].reshape(G, -1, 64).astype(
                np.float64
            )
            zzc *= q_stack[:, None, :]
            blocks = np.zeros((G * zzc.shape[1], 64), dtype=np.float64)
            blocks[:, ZIGZAG_FLAT] = zzc.reshape(-1, 64)
            pix = DCT_M.T @ blocks.reshape(-1, 8, 8) @ DCT_M + 128.0
            plane = (
                pix.reshape(G, gmy, gmx, v_, h_, 8, 8)
                .transpose(0, 1, 3, 5, 2, 4, 6)
                .reshape(G, gmy * v_ * 8, gmx * h_ * 8)
            )
            ry, rx = gvm // v_, ghm // h_
            if ry > 1 or rx > 1:
                plane = np.repeat(np.repeat(plane, ry, axis=1), rx, axis=2)
            full.append(plane[:, :gh, :gw])
        # rint == round(decimals=0) (half-to-even) but skips np.round's
        # scale-path; out= chains avoid ~6 full-array float temporaries
        def _to_u8(ch, out2d):
            np.rint(ch, out=ch)
            np.clip(ch, 0, 255, out=ch)
            out2d[...] = ch
        if len(full) == 1:
            out = np.empty((G, gh, gw, 1), dtype=np.uint8)
            _to_u8(full[0], out[..., 0])
            for j, (_r, i, _p) in enumerate(lst):
                results[i] = out[j]
        elif len(full) != 3:
            err = ValueError(f"unsupported JPEG component count {len(full)}")
            for _r, i, _p in lst:
                results[i] = err
        else:
            # operation ORDER mirrors the scalar path exactly — float
            # add is commutative bit-for-bit, but the g-channel's two
            # subtractions must keep the scalar's association
            y, cb, cr = full[0], full[1], full[2]
            cb -= 128.0
            cr -= 128.0
            out = np.empty((G, gh, gw, 3), dtype=np.uint8)
            t1 = cr * 1.402
            t1 += y  # (1.402*cr) + y == y + 1.402*cr
            _to_u8(t1, out[..., 0])
            np.multiply(cb, 0.344136, out=t1)
            t2 = y - t1
            np.multiply(cr, 0.714136, out=t1)
            t2 -= t1  # (y - 0.344136*cb) - 0.714136*cr
            _to_u8(t2, out[..., 1])
            np.multiply(cb, 1.772, out=t1)
            t1 += y  # (1.772*cb) + y == y + 1.772*cb
            _to_u8(t1, out[..., 2])
            for j, (_r, i, _p) in enumerate(lst):
                results[i] = out[j]


# --------------------------------------------------------------------------
# Encoder (tests' round-trip partner; baseline, Annex-K tables)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl.reshape(-1) * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def _pad(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (markers are written unstuffed)."""
        self._pad()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        self._pad()
        return bytes(self.out)


def _encode_codes(spec) -> dict:
    """symbol -> (code, length) for the encoder side."""
    return {sym: (code, ln) for (ln, code), sym in _build_huffman(spec).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(writer, block, quant, dc_codes, ac_codes, pred):
    coeff = DCT_M @ (block - 128.0) @ DCT_M.T
    zz = np.empty(64, dtype=np.int64)
    for idx, (r, c) in enumerate(ZIGZAG):
        zz[idx] = int(np.round(coeff[r, c] / quant[idx]))
    diff = int(zz[0]) - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        v = int(zz[k])
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W[, 1|3]) uint8 as a baseline JPEG (4:4:4, or 4:2:0
    box-averaged chroma when ``subsample``). Gray input emits a
    single-component JPEG. ``restart_interval`` > 0 emits a DRI segment
    and an RSTn marker every that-many MCUs (DC predictors reset) —
    identical decoded pixels, but the entropy stream splits into
    independent segments the lockstep decoder fans out as parallel
    lanes (`_decode_group`), which is also how production encoders make
    huge scans decodable in parallel."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants 1 or 3 channels")
    ql = _quality_scale(QUANT_LUMA[[rc[0] for rc in ZIGZAG], [rc[1] for rc in ZIGZAG]], quality)
    qc = _quality_scale(QUANT_CHROMA[[rc[0] for rc in ZIGZAG], [rc[1] for rc in ZIGZAG]], quality)

    if nc == 3:
        rf, gf, bf = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        chans = [y, cb, cr]
    else:
        chans = [img[:, :, 0].astype(np.float64)]

    sub = 2 if (subsample and nc == 3) else 1
    hv = [(sub, sub)] + [(1, 1)] * (nc - 1) if nc == 3 else [(1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(v for _, v in hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = []
    for ci, ch in enumerate(chans):
        fh, fv = hv[ci]
        ph = mcus_y * fv * 8
        pw = mcus_x * fh * 8
        if ci > 0 and sub == 2:  # box-average 2x2 chroma
            hh, ww = (h + 1) // 2, (w + 1) // 2
            padded = np.pad(ch, ((0, h % 2), (0, w % 2)), mode="edge")
            ch = padded.reshape(hh, 2, ww, 2).mean(axis=(1, 3))
        src_h, src_w = ch.shape
        plane = np.pad(
            ch, ((0, ph - src_h), (0, pw - src_w)), mode="edge"
        )
        planes.append(plane)

    writer = _BitWriter()
    dc_l, ac_l = _encode_codes(DC_LUMA_SPEC), _encode_codes(AC_LUMA_SPEC)
    dc_c, ac_c = _encode_codes(DC_CHROMA_SPEC), _encode_codes(AC_CHROMA_SPEC)
    restart_interval = int(restart_interval)
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError("restart_interval must fit in 16 bits")
    pred = [0] * nc
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.restart((mcu // restart_interval) - 1)
            pred = [0] * nc
        my, mx = divmod(mcu, mcus_x)
        for ci in range(nc):
            fh, fv = hv[ci]
            quant = ql if ci == 0 else qc
            dct_codes = dc_l if ci == 0 else dc_c
            act_codes = ac_l if ci == 0 else ac_c
            for by in range(fv):
                for bx in range(fh):
                    y0 = (my * fv + by) * 8
                    x0 = (mx * fh + bx) * 8
                    block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                    pred[ci] = _encode_block(
                        writer, block, quant, dct_codes, act_codes, pred[ci]
                    )
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xDB, bytes([0x00]) + bytes(ql.tolist()))
    if nc == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.tolist()))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        fh, fv = hv[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, spec):
        counts, symbols = spec
        return seg(0xC4, bytes([(tc << 4) | th] + counts + symbols))

    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    if nc == 3:
        out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos) + entropy + b"\xff\xd9"
    return out
