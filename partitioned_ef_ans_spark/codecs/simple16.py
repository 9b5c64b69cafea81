"""Simple16 block codec (block_codecs.hpp:354-381 simple16_block).

The reference vendors FastPFor's Simple16<false>; the vendored library
is not part of this repo's reference checkout, so this is a clean-room
implementation of the canonical public Simple16 scheme (Anh & Moffat
"Inverted index compression using word-aligned binary codes", as used
by FastPFor): each 32-bit word = 4-bit selector + 28 payload bits,
sixteen fixed packing cases, greedy first-fitting case per word.
Block interface (128-value blocks, byte-aligned payload) matches the
engine's other block codecs; the exact word layout is self-consistent
rather than bit-identical to the vendored C++ (documented divergence —
SURVEY marks K7 optional).
"""

from __future__ import annotations

import numpy as np

#: the 16 cases: list of (count, bits) runs per 28-bit payload
CASES: list[list[tuple[int, int]]] = [
    [(28, 1)],
    [(7, 2), (14, 1)],
    [(7, 1), (7, 2), (7, 1)],
    [(14, 1), (7, 2)],
    [(14, 2)],
    [(1, 4), (8, 3)],
    [(1, 3), (4, 4), (3, 3)],
    [(7, 4)],
    [(4, 5), (2, 4)],
    [(2, 4), (4, 5)],
    [(3, 6), (2, 5)],
    [(2, 5), (3, 6)],
    [(4, 7)],
    [(1, 10), (2, 9)],
    [(2, 14)],
    [(1, 28)],
]

_CASE_COUNTS = [sum(c for c, _ in case) for case in CASES]
_CASE_BITS = [
    np.array(
        [b for c, b in case for _ in range(c)], dtype=np.int64
    )
    for case in CASES
]


def _encode_word(vals: np.ndarray, start: int) -> tuple[int, int]:
    """Pick the first case that fits vals[start:]; returns (word, taken)."""
    remaining = len(vals) - start
    for sel, bits in enumerate(_CASE_BITS):
        take = min(_CASE_COUNTS[sel], remaining)
        if take < _CASE_COUNTS[sel] and sel != 15 and remaining < _CASE_COUNTS[sel]:
            # partial word: only allowed if every remaining value fits
            chunk = vals[start:]
            if np.all(chunk < (1 << bits[: len(chunk)])):
                word = sel << 28
                shift = 28
                for v, b in zip(chunk, bits[: len(chunk)]):
                    shift -= int(b)
                    word |= int(v) << shift
                return word, len(chunk)
            continue
        chunk = vals[start : start + _CASE_COUNTS[sel]]
        if len(chunk) == _CASE_COUNTS[sel] and np.all(chunk < (1 << bits)):
            word = sel << 28
            shift = 28
            for v, b in zip(chunk, bits):
                shift -= int(b)
                word |= int(v) << shift
            return word, _CASE_COUNTS[sel]
    raise ValueError("value does not fit in 28 bits")


def encode(vals: np.ndarray) -> bytes:
    vals = np.asarray(vals, dtype=np.uint64)
    if np.any(vals >= (1 << 28)):
        raise ValueError("simple16 requires values < 2^28")
    words = []
    i = 0
    while i < len(vals):
        w, taken = _encode_word(vals, i)
        words.append(w)
        i += taken
    return np.array(words, dtype="<u4").tobytes()


def decode(payload: np.ndarray, n: int, offset: int) -> tuple[np.ndarray, int]:
    """-> (values[n], next_offset)."""
    raw = payload.tobytes() if isinstance(payload, np.ndarray) else payload
    out = np.empty(n, dtype=np.uint32)
    got = 0
    pos = offset
    while got < n:
        word = int.from_bytes(raw[pos : pos + 4], "little")
        pos += 4
        sel = word >> 28
        bits = _CASE_BITS[sel]
        shift = 28
        for b in bits:
            if got == n:
                break
            shift -= int(b)
            out[got] = (word >> shift) & ((1 << int(b)) - 1)
            got += 1
    return out, pos


class Simple16Codec:
    """Block-codec interface over Simple16 (K7)."""

    name = "simple16"
    block_size = 128

    def encode_batch(self, blocks, ns, sums) -> list[bytes]:
        return [
            encode(np.asarray(blocks[b, : ns[b]], dtype=np.uint64))
            for b in range(blocks.shape[0])
        ]

    def decode_batch(self, payload, offsets, ns, sums):
        B = len(offsets)
        out = np.zeros((B, self.block_size), dtype=np.uint32)
        sizes = np.zeros(B, dtype=np.int64)
        raw = payload.tobytes()
        for b in range(B):
            vals, nxt = decode(raw, int(ns[b]), int(offsets[b]))
            out[b, : ns[b]] = vals
            sizes[b] = nxt - int(offsets[b])
        return out, sizes
