"""varint-G8IU block codec (K3, block_codecs.hpp:189-255
`varint_G8IU_block`).

The reference vendors FastPFor's ``VarIntG8IU``; the vendored library
is not part of the reference checkout, so this is a clean-room NumPy
implementation of the published group-varint G8IU format (Stepanov,
Gangolli, Rose, Ernst & Oberoi, "SIMD-based decoding of posting
lists", CIKM 2011): the stream is a sequence of 9-byte groups — one
descriptor byte followed by exactly 8 data bytes.  Each u32 value
occupies its minimal 1-4 little-endian bytes; a group packs as many
COMPLETE values as fit in its 8 data bytes ("incomplete unit": a value
that would straddle the boundary starts the next group, the remaining
data bytes are padding).  Descriptor bit i (LSB-first) is 1 iff data
byte i is the LAST byte of a value; padding bits are 0.

The group count of a block is not stored: the decoder pops groups and
counts completed values until the block's n is reached, exactly like
the reference's overshoot-tolerant decode loop
(block_codecs.hpp:226-247).  Partial blocks (n < 128) fall back to
TightVariableByte (block_codecs.hpp:213-215).  The SIMD shuffle tables
of the original are a decode strategy, not part of the format; here
decode is table-free NumPy over the (groups x 8) byte matrix.
"""

from __future__ import annotations

import numpy as np

from partitioned_ef_ans_spark.codecs import vbyte

BLOCK_SIZE = 128
GROUP_BYTES = 9  # 1 descriptor + 8 data


def _nbytes(v: np.ndarray) -> np.ndarray:
    """Minimal LE byte length per u32 value (1-4; 0 encodes as 1)."""
    n = np.ones(len(v), dtype=np.int64)
    for bound in (1 << 8, 1 << 16, 1 << 24):
        n += v >= bound
    return n


def encode_full_block(vals: np.ndarray) -> bytes:
    """One 128-value block -> contiguous 9-byte groups."""
    v = np.asarray(vals, dtype=np.uint64)
    nb = _nbytes(v)
    groups = []
    i = 0
    n = len(v)
    while i < n:
        # take as many whole values as fit in 8 data bytes
        csum = np.cumsum(nb[i:])
        take = int(np.searchsorted(csum, 8, side="right"))
        chunk, lens = v[i : i + take], nb[i : i + take]
        data = np.zeros(8, dtype=np.uint8)
        desc = 0
        pos = 0
        for val, ln in zip(chunk, lens):
            for j in range(int(ln)):
                data[pos + j] = (int(val) >> (8 * j)) & 0xFF
            pos += int(ln)
            desc |= 1 << (pos - 1)
        groups.append(bytes([desc]) + data.tobytes())
        i += take
    return b"".join(groups)


def decode_full_blocks(
    raw: bytes, offsets: np.ndarray, n: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Decode many full blocks -> ((B, n) values, consumed bytes).

    Group counts are discovered from the descriptors (popcount = values
    completed per group); all groups of all blocks then decode in one
    vectorized pass over a (total_groups, 8) byte matrix.
    """
    B = len(offsets)
    buf = np.frombuffer(raw, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    # max groups per block: >= 2 values per group -> <= n // 2
    max_groups = n // 2
    cand = offsets[:, None] + GROUP_BYTES * np.arange(max_groups)[None, :]
    np.clip(cand, 0, len(buf) - 1, out=cand)
    descs = buf[cand]
    pops = np.unpackbits(descs[..., None], axis=2, bitorder="little").sum(
        axis=2, dtype=np.int64
    )
    cum = np.cumsum(pops, axis=1)
    ngroups = np.argmax(cum >= n, axis=1) + 1
    sizes = GROUP_BYTES * ngroups

    # flatten every real group of every block
    blk_id = np.repeat(np.arange(B), ngroups)
    in_blk = np.concatenate([np.arange(g) for g in ngroups])
    goff = offsets[blk_id] + GROUP_BYTES * in_blk
    desc = buf[goff]
    data = buf[goff[:, None] + 1 + np.arange(8)[None, :]].astype(np.uint64)
    ends = np.unpackbits(desc[:, None], axis=1, bitorder="little").astype(
        np.int64
    )  # (G, 8): byte i ends a value
    # value index within the group for each byte (exclusive cumsum)
    vid = np.cumsum(ends, axis=1) - ends
    nvals = ends.sum(axis=1)
    pad = vid >= nvals[:, None]  # padding bytes after the last end bit
    # byte position within its value: distance from the value's start
    idx = np.arange(8)[None, :].repeat(len(desc), axis=0)
    start = np.where(ends == 1, idx + 1, 0)  # next value starts after an end
    vstart = np.maximum.accumulate(
        np.concatenate([np.zeros((len(desc), 1), dtype=np.int64), start[:, :-1]], axis=1),
        axis=1,
    )
    bytepos = idx - vstart
    contrib = np.where(pad, 0, data << np.uint64(8) * bytepos.astype(np.uint64))
    # accumulate bytes into per-group value slots (<= 8 values per group)
    gvals = np.zeros((len(desc), 8), dtype=np.uint64)
    g_idx = np.arange(len(desc))[:, None].repeat(8, axis=1)
    np.add.at(gvals, (g_idx[~pad], vid[~pad]), contrib[~pad])

    # stitch each block's groups back together (groups emit their
    # nvals values in order)
    out = np.empty((B, n), dtype=np.uint32)
    gstart = np.concatenate([[0], np.cumsum(ngroups)[:-1]])
    for b in range(B):
        s = gstart[b]
        e = s + ngroups[b]
        flat = gvals[s:e].reshape(-1)
        keep = (np.arange(8)[None, :] < nvals[s:e, None]).reshape(-1)
        out[b] = flat[keep][:n].astype(np.uint32)
    return out, sizes


class VarintG8IUCodec:
    """Block-codec interface over varint-G8IU (K3): full 128-value
    blocks use the 9-byte-group format, partial blocks vbyte."""

    name = "varintg8iu"
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
