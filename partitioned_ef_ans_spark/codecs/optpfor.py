"""OptPFor block codec (K2, block_codecs.hpp:107-187 `optpfor_block`).

The reference vendors FastPFor's ``OPTPFor<4, Simple16<false>>``; the
vendored library is not part of the reference checkout, so this is a
clean-room NumPy implementation of the published OptPFD scheme (Yan,
Ding & Suel, "Inverted index compression and query processing with
optimized document ordering", WWW 2009) with the exact header layout
the reference's cut-and-pasted ``decodeBlock`` documents
(block_codecs.hpp:112-145):

  header u32:  b (6 bits, top) | nExceptions (10 bits) |
               exceptionWords (16 bits, low)
  exceptions:  Simple16-coded array of 2*nExceptions values —
               first the exception POSITION GAPS minus 1
               (``lpos += exceptions[e] + 1`` starting at -1), then the
               HIGH PARTS minus 1 (``(exceptions[e+n]+1) << b`` is
               OR-ed back in)
  packed:      128 values x b low bits, bit-packed in four 32-value
               groups (b words per group -> 4b words)

b is chosen per block by exact total-size minimization over the
FastPFor candidate list (the "Opt" in OptPFor); partial blocks
(n < 128) fall back to TightVariableByte exactly like the reference
(block_codecs.hpp:161-167).  The word layout inside the packed groups
is self-consistent (LSB-first within the 32*b bit group) rather than
bit-identical to the vendored SIMD fastunpack (documented divergence,
same as the simple16 codec).
"""

from __future__ import annotations

import numpy as np

from partitioned_ef_ans_spark.codecs import simple16, vbyte

BLOCK_SIZE = 128

#: candidate bit widths (FastPFor OPTPFor tries a fixed list; widths
#: 14/15 and 17-19 etc. are representable but never win vs neighbours)
CAND_BITS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16, 20, 32)

_HDR_B_SHIFT = 26  # 32 - 6
_HDR_NEXC_SHIFT = 16  # 32 - (6 + 10)
_HDR_EXCSZ_MASK = (1 << 16) - 1


def _bitlen(v: np.ndarray) -> np.ndarray:
    """Element-wise bit length (0 for 0); exact for v < 2^53."""
    _, e = np.frexp(v.astype(np.float64))
    return e.astype(np.int64)


def _pack_group(vals: np.ndarray, b: int) -> np.ndarray:
    """(G, 32) low-b-bit values -> (G, b) u32 words, LSB-first layout:
    value i occupies bits [i*b, (i+1)*b) of the group's b*32-bit span."""
    G = vals.shape[0]
    words = np.zeros((G, b), dtype=np.uint64)
    v = vals.astype(np.uint64) & np.uint64((1 << b) - 1)
    for i in range(32):
        bitpos = i * b
        w, sh = bitpos >> 5, bitpos & 31
        words[:, w] |= (v[:, i] << np.uint64(sh)) & np.uint64(0xFFFFFFFF)
        spill = sh + b - 32
        if spill > 0:
            words[:, w + 1] |= v[:, i] >> np.uint64(b - spill)
    return words.astype(np.uint32)


def _unpack_group(words: np.ndarray, b: int) -> np.ndarray:
    """(G, b) u32 words -> (G, 32) values (inverse of _pack_group)."""
    G = words.shape[0]
    out = np.empty((G, 32), dtype=np.uint32)
    w64 = words.astype(np.uint64)
    mask = np.uint64((1 << b) - 1)
    for i in range(32):
        bitpos = i * b
        w, sh = bitpos >> 5, bitpos & 31
        v = w64[:, w] >> np.uint64(sh)
        spill = sh + b - 32
        if spill > 0:
            v |= w64[:, w + 1] << np.uint64(b - spill)
        out[:, i] = (v & mask).astype(np.uint32)
    return out


def _encode_exceptions(vals: np.ndarray, b: int) -> tuple[bytes, int] | None:
    """Simple16 stream for one block's exceptions under width b, or
    None when a high part overflows simple16's 28-bit limit."""
    pos = np.flatnonzero(vals >> np.uint64(b) if b else vals > 0)
    n_exc = len(pos)
    if n_exc == 0:
        return b"", 0
    highs = (vals[pos] >> np.uint64(b)).astype(np.uint64)
    if np.any(highs - 1 >= (1 << 28)) or n_exc >= (1 << 10):
        return None
    gaps = np.diff(pos, prepend=-1) - 1
    payload = simple16.encode(
        np.concatenate([gaps.astype(np.uint64), highs - 1])
    )
    return payload, n_exc


def encode_full_block(vals: np.ndarray) -> bytes:
    """One 128-value block -> header + exceptions + packed words."""
    v = np.asarray(vals, dtype=np.uint64)
    bl = _bitlen(v)
    maxb = int(bl.max()) if len(bl) else 0
    best = None  # (words, b, exc_bytes, n_exc)
    for b in CAND_BITS:
        if b >= maxb:
            exc_bytes, n_exc = b"", 0
        else:
            n_exc_est = int((bl > b).sum())
            # lower bound: 28 exception values per simple16 word
            lb_words = 1 + 4 * b + -(-2 * n_exc_est // 28)
            if best is not None and lb_words >= best[0]:
                continue
            enc = _encode_exceptions(v, b)
            if enc is None:
                continue
            exc_bytes, n_exc = enc
        words = 1 + len(exc_bytes) // 4 + 4 * b
        if best is None or words < best[0]:
            best = (words, b, exc_bytes, n_exc)
        if b >= maxb:
            break  # larger b only adds packed words
    words, b, exc_bytes, n_exc = best
    header = (
        (b << _HDR_B_SHIFT)
        | (n_exc << _HDR_NEXC_SHIFT)
        | (len(exc_bytes) // 4)
    )
    if b == 0:
        packed = b""
    else:
        packed = _pack_group(v.reshape(4, 32), b).tobytes()
    return int(header).to_bytes(4, "little") + exc_bytes + packed


def decode_full_blocks(
    raw: bytes, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode many full blocks -> ((B, 128) values, consumed bytes)."""
    B = len(offsets)
    out = np.empty((B, BLOCK_SIZE), dtype=np.uint32)
    sizes = np.empty(B, dtype=np.int64)
    buf = np.frombuffer(raw, dtype=np.uint8)
    for i in range(B):
        o = int(offsets[i])
        header = int.from_bytes(raw[o : o + 4], "little")
        b = header >> _HDR_B_SHIFT
        n_exc = (header >> _HDR_NEXC_SHIFT) & ((1 << 10) - 1)
        exc_words = header & _HDR_EXCSZ_MASK
        p = o + 4
        if b:
            packed = np.frombuffer(
                raw, dtype="<u4", count=4 * b, offset=p + 4 * exc_words
            )
            vals = _unpack_group(packed.reshape(4, b), b).reshape(-1)
        else:
            vals = np.zeros(BLOCK_SIZE, dtype=np.uint32)
        if n_exc:
            exc, _ = simple16.decode(buf, 2 * n_exc, p)
            pos = np.cumsum(exc[:n_exc].astype(np.int64) + 1) - 1
            vals = vals.astype(np.uint64)
            vals[pos] |= (exc[n_exc:].astype(np.uint64) + 1) << np.uint64(b)
            vals = vals.astype(np.uint32)
        out[i] = vals
        sizes[i] = 4 * (1 + exc_words + 4 * b)
    return out, sizes


class OptPForCodec:
    """Block-codec interface over OptPFor (K2): full 128-value blocks
    use the PFor format, partial blocks TightVariableByte."""

    name = "optpfor"
    block_size = BLOCK_SIZE

    def encode_batch(self, blocks, ns, sums) -> list[bytes]:
        out = []
        for b in range(blocks.shape[0]):
            n = int(ns[b])
            vals = np.asarray(blocks[b, :n], dtype=np.uint64)
            if n == BLOCK_SIZE:
                out.append(encode_full_block(vals))
            else:
                out.append(vbyte.encode(vals.astype(np.uint32)))
        return out

    def decode_batch(self, payload, offsets, ns, sums):
        B = len(offsets)
        out = np.zeros((B, BLOCK_SIZE), dtype=np.uint32)
        sizes = np.zeros(B, dtype=np.int64)
        ns = np.asarray(ns, dtype=np.int64)
        full = np.flatnonzero(ns == BLOCK_SIZE)
        if len(full):
            raw = payload.tobytes() if isinstance(payload, np.ndarray) else payload
            vals, sz = decode_full_blocks(raw, np.asarray(offsets)[full])
            out[full] = vals
            sizes[full] = sz
        for b in np.flatnonzero(ns != BLOCK_SIZE):
            n = int(ns[b])
            vals, nxt = vbyte.decode(payload, n, int(offsets[b]))
            out[b, :n] = vals
            sizes[b] = nxt - int(offsets[b])
        return out, sizes
