"""Tight variable-byte codec (NumPy-vectorized).

Stream format matches the reference's ``TightVariableByte``
(block_codecs.hpp:17-105): 7-bit groups, LITTLE-endian group order,
and the **terminator bit set on the LAST byte** of each value (the
inverse of classic vbyte continuation bits).  Used as the small-list
fallback throughout the engine (ANS short lists, list headers).
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    """Vectorized encode of a u32 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    for k, bound in enumerate((1 << 7, 1 << 14, 1 << 21, 1 << 28)):
        nbytes += v >= bound
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # byte j of value i lives at starts[i]+j and holds bits [7j, 7j+7)
    for j in range(5):
        mask = nbytes > j
        if not mask.any():
            break
        pos = starts[mask] + j
        byte = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        last = nbytes[mask] == j + 1
        byte = byte | (last.astype(np.uint64) << np.uint64(7))
        out[pos] = byte.astype(np.uint8)
    return out.tobytes()


def encode_single(value: int) -> bytes:
    return encode(np.array([value], dtype=np.uint64))


def decode(buf: np.ndarray, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``n`` values from ``buf`` starting at ``offset``.

    Returns (values, next_offset).  Vectorized: terminator bytes (high
    bit set) delimit values; 7-bit groups are combined with shifts.
    """
    if n == 0:
        return np.empty(0, dtype=np.uint32), offset
    b = np.asarray(buf, dtype=np.uint8)
    # find the n-th terminator; values are <=5 bytes so the scan window
    # is bounded (keeps batch decodes O(n), not O(buffer))
    window = b[offset : offset + 5 * n]
    is_term = (window & 0x80) != 0
    term_idx = np.flatnonzero(is_term)
    if term_idx.size < n:
        raise ValueError("vbyte: truncated stream")
    end = offset + int(term_idx[n - 1]) + 1
    region = b[offset:end].astype(np.uint64)
    terms = (region & 0x80) != 0
    # value id of each byte = number of terminators before it
    vid = np.zeros(region.size, dtype=np.int64)
    vid[1:] = np.cumsum(terms[:-1])
    # byte position within its value
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.flatnonzero(terms)[: n - 1] + 1
    bytepos = np.arange(region.size, dtype=np.int64) - starts[vid]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, vid, (region & np.uint64(0x7F)) << (np.uint64(7) * bytepos.astype(np.uint64)))
    return vals.astype(np.uint32), end


def decode_single(buf: np.ndarray, offset: int = 0) -> tuple[int, int]:
    vals, nxt = decode(buf, 1, offset)
    return int(vals[0]), nxt
