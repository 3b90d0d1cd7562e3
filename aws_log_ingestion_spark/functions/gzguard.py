"""Capped gzip inflation for untrusted cells (decompression-bomb guard).

`gzip.decompress` on an attacker-supplied cell has no output bound: a
~1 KB crafted member inflates ~1000x, and at tens of parallel tasks the
OS OOM killer takes the executor down before any ``except`` clause runs.
Every pipeline site that inflates bytes *from a data cell* (trace-marker
blobs, envelope payloads; the PNG decoder has its own geometry-derived
cap) goes through this helper so the failure is a clean, catchable
ValueError inside the row's own error contract.
"""

from __future__ import annotations

import zlib


def gunzip_capped(data: bytes, cap: int) -> bytes:
    """Inflate one gzip member, refusing to produce more than ``cap``
    bytes (ValueError). Truncated streams and trailing bytes after the
    member are rejected just as ``gzip.decompress`` rejects them, so
    behavior only diverges on payloads past the cap (and on multi-member
    concatenations, which none of the pipeline's formats produce)."""
    d = zlib.decompressobj(wbits=31)  # 16+15: gzip framing
    out = d.decompress(data, cap + 1)
    if len(out) > cap:
        raise ValueError(f"gzip payload inflates beyond the {cap}-byte cap")
    if not d.eof or d.unused_data:
        raise ValueError("truncated gzip stream or trailing data")
    return out
