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
~21 on 256x256 q75. Still fixture-grade next to libjpeg-turbo: a
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
    lut = (sym.tolist(), lng.tolist())
    if len(_LUT_CACHE) < 64:  # bounded; 4 tables/image, specs recur
        _LUT_CACHE[key] = lut
    return lut


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG to an (H, W, 3) uint8 RGB array
    ((H, W, 1) for single-component grayscale). ValueError on anything
    that isn't 8-bit baseline Huffman (progressive, arithmetic, 12-bit,
    truncated streams) — including arbitrary malformed bytes, so the
    media operators' per-row fallback isolation holds."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, StopIteration) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from None


def _decode_jpeg(payload: bytes):
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
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
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
            return _decode_scan(
                payload, data_start, sof, scan, qt, huff, restart_interval
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(payload, start, sof, scan, qt, huff, restart_interval):
    # Destuff: 0xFF00 -> 0xFF; restart markers recorded as segment breaks.
    segments, cur = [], bytearray()
    i = start
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: new entropy segment
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan (EOI)
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    h, w, comps = sof["h"], sof["w"], scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes: list = [None] * len(comps)  # assembled batched after the scan
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
                dc_sym, dc_len = dc_tab
                ac_sym, ac_len = ac_tab
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

    # Batched dequantize + de-zigzag + IDCT: one (N, 64) array and one
    # broadcast matmul per component instead of 4-6 numpy calls per
    # block (the per-block dispatch overhead was ~30% of decode time).
    # Blocks append in MCU-major (my, mx, by, bx) order, so the plane is
    # a reshape/transpose of the batch — no scatter loop.
    for ci, c in enumerate(comps):
        v_, h_ = c["v"], c["h"]
        zzs = np.array(coeff_rows[ci], dtype=np.float64) * tabs[ci][2]
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

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
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


def encode_jpeg(img, quality: int = 90, subsample: bool = False) -> bytes:
    """Encode (H, W[, 1|3]) uint8 as a baseline JPEG (4:4:4, or 4:2:0
    box-averaged chroma when ``subsample``). Gray input emits a
    single-component JPEG."""
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
    pred = [0] * nc
    for mcu in range(mcus_x * mcus_y):
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
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos) + entropy + b"\xff\xd9"
    return out
