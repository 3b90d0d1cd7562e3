"""Decompression-bomb guards: every site that inflates bytes from a data
cell must fail inside its own row-level error contract (ValueError or
''), never OOM the worker — a ~1 KB gzip member inflates ~1000x, and
`except Exception` cannot catch an OS OOM kill."""

from __future__ import annotations

import gzip
import json
import struct
from base64 import b64encode

import numpy as np
import pytest

from aws_log_ingestion_spark.functions.gzguard import gunzip_capped
from aws_log_ingestion_spark.functions.tracing import decode_trace_id_str
from aws_log_ingestion_spark.operators.multimodal import decode_png, encode_png


def test_gunzip_capped_roundtrip_and_cap():
    body = b"payload " * 1000
    assert gunzip_capped(gzip.compress(body), len(body)) == body
    with pytest.raises(ValueError, match="inflates beyond"):
        gunzip_capped(gzip.compress(body), len(body) - 1)
    # a 40 KB member claiming ~40 MB out stops at the cap, fast
    bomb = gzip.compress(b"\x00" * (40 << 20))
    assert len(bomb) < (1 << 16)
    with pytest.raises(ValueError, match="inflates beyond"):
        gunzip_capped(bomb, 1 << 20)


def test_gunzip_capped_matches_gzip_strictness():
    blob = gzip.compress(b"abc")
    with pytest.raises(ValueError, match="truncated|trailing"):
        gunzip_capped(blob[:-5], 1 << 10)  # truncated member
    with pytest.raises(ValueError, match="truncated|trailing"):
        gunzip_capped(blob + b"junk", 1 << 10)  # trailing garbage


def test_trace_decode_bomb_yields_empty_string():
    bomb = b64encode(gzip.compress(b"\x00" * (128 << 20))).decode()
    marker = json.dumps([1, "NR_LAMBDA_MONITORING", bomb])
    assert decode_trace_id_str(marker) == ""


def test_wav_short_fmt_chunk_is_valueerror():
    from aws_log_ingestion_spark.operators.multimodal import decode_wav

    # fmt chunk claiming 16 bytes but truncated to 4: struct.error must
    # not escape the decoder's ValueError contract
    bad = b"RIFF" + struct.pack("<I", 16) + b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    with pytest.raises(ValueError, match="short WAV fmt chunk"):
        decode_wav(bad)


def test_png_bomb_headers_stay_on_valueerror_path():
    base = encode_png(np.full((8, 8, 3), 77, dtype=np.uint8))
    j = base.find(b"IHDR")
    assert j > 0
    # claim a 60000x60000 frame: must fail on the size cap BEFORE any
    # inflate or output allocation (decoder ignores the stale CRC)
    patched = bytearray(base)
    patched[j + 4 : j + 12] = struct.pack(">II", 60000, 60000)
    with pytest.raises(ValueError, match="size cap"):
        decode_png(bytes(patched))
    # honest dims but an IDAT inflating past the claimed geometry
    assert np.array_equal(
        decode_png(base), np.full((8, 8, 3), 77, dtype=np.uint8)
    )
