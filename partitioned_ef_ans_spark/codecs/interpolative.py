"""Binary interpolative block codec (block_codecs.hpp:257-307
interpolative_block, K4).

Outer transform reproduced exactly from the reference: values become
the strictly-increasing prefix sequence inbuf[i] = sum(in[:i+1]) + i;
when sum_of_values is unknown it is inferred as inbuf[-1] - (n-1) and
vbyte-prefixed; the last element equals high = sum + n - 1 and is
implicit, the first n-1 elements are interpolative-coded in [0, high].

The bit-level code is this engine's own minimal-binary interpolative
recursion (midpoint element first, range split left/right) on the
LSB-first BitWriter — the reference delegates those bits to the
vendored integer_encoding_library (not present in this checkout), so
the stream is self-consistent rather than bit-identical (documented
divergence; SURVEY marks K4 optional).
"""

from __future__ import annotations

import numpy as np

from partitioned_ef_ans_spark.codecs import ef, vbyte


def _write_minbin(bw: ef.BitWriter, x: int, r: int) -> None:
    """Minimal binary code for x in [0, r), r >= 1."""
    if r <= 1:
        return
    b = ef.ceil_log2(r)
    t = (1 << b) - r
    if x < t:
        bw.append_bits(x, b - 1)
    else:
        y = x + t
        bw.append_bits(y >> 1, b - 1)
        bw.append_bits(y & 1, 1)


def _read_minbin(br: ef.BitReader, r: int) -> int:
    if r <= 1:
        return 0
    b = ef.ceil_log2(r)
    t = (1 << b) - r
    h = br.take(b - 1)
    if h < t:
        return h
    return h * 2 + br.take(1) - t


def _enc(bw: ef.BitWriter, arr, lo: int, hi: int) -> None:
    n = len(arr)
    if n == 0:
        return
    m = n // 2
    v = int(arr[m])
    a = lo + m
    b = hi - (n - 1 - m)
    _write_minbin(bw, v - a, b - a + 1)
    _enc(bw, arr[:m], lo, v - 1)
    _enc(bw, arr[m + 1 :], v + 1, hi)


def _dec(br: ef.BitReader, n: int, lo: int, hi: int, out, base: int) -> None:
    if n == 0:
        return
    m = n // 2
    a = lo + m
    b = hi - (n - 1 - m)
    v = a + _read_minbin(br, b - a + 1)
    out[base + m] = v
    _dec(br, m, lo, v - 1, out, base)
    _dec(br, n - 1 - m, v + 1, hi, out, base + m + 1)


SUM_UNKNOWN = -1  # blocks.SUM_UNKNOWN (the reference passes uint32(-1))


def encode_block(vals: np.ndarray, sum_of_values: int) -> bytes:
    n = len(vals)
    inbuf = np.cumsum(np.asarray(vals, dtype=np.int64)) + np.arange(n)
    parts = []
    if sum_of_values < 0:
        sum_of_values = int(inbuf[-1]) - (n - 1)
        parts.append(vbyte.encode_single(sum_of_values))
    if n > 1:
        high = sum_of_values + n - 1
        bw = ef.BitWriter()
        _enc(bw, inbuf[: n - 1], 0, high)
        # byte precision, not BitWriter's word padding: the decoder
        # advances by ceil(bits/8) to find the next block
        parts.append(bw.tobytes()[: (bw.size + 7) >> 3])
    return b"".join(parts)


def decode_block(raw: bytes, offset: int, n: int, sum_of_values: int):
    """-> (values[n], next_offset)."""
    pos = offset
    if sum_of_values < 0:
        sum_of_values, pos = vbyte.decode_single(
            np.frombuffer(raw, dtype=np.uint8), pos
        )
    high = sum_of_values + n - 1
    inbuf = np.empty(n, dtype=np.int64)
    inbuf[n - 1] = high
    if n > 1:
        window = np.frombuffer(raw, dtype=np.uint8)[pos : pos + 8 * n + 64]
        br = ef.BitReader(window.copy())
        _dec(br, n - 1, 0, high, inbuf, 0)
        pos += (br.pos + 7) >> 3
    # undo the prefix transform: in[0]=inbuf[0], in[i]=inbuf[i]-inbuf[i-1]-1
    return np.diff(inbuf, prepend=-1) - 1, pos


class InterpolativeCodec:
    """Block-codec interface over binary interpolative coding (K4)."""

    name = "interpolative"
    block_size = 128

    def encode_batch(self, blocks_m, ns, sums) -> list[bytes]:
        return [
            encode_block(
                np.asarray(blocks_m[b, : ns[b]], dtype=np.int64), int(sums[b])
            )
            for b in range(blocks_m.shape[0])
        ]

    def decode_batch(self, payload, offsets, ns, sums):
        B = len(offsets)
        out = np.zeros((B, self.block_size), dtype=np.uint32)
        sizes = np.zeros(B, dtype=np.int64)
        raw = payload.tobytes()
        for b in range(B):
            vals, nxt = decode_block(raw, int(offsets[b]), int(ns[b]), int(sums[b]))
            out[b, : ns[b]] = vals
            sizes[b] = nxt - int(offsets[b])
        return out, sizes
