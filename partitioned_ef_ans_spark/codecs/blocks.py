"""Block posting-list layout + simple block codecs.

Byte layout per list (block_posting_list.hpp:139-182 /
ans_block_posting_list.hpp:173-215):

  vbyte(n)
  block_maxs:      u32 LE x num_blocks   (last docID of each block)
  block_endpoints: u32 LE x (num_blocks-1)  (byte offset of next block's
                   payload relative to payload start)
  payload blocks:  codec(d-gaps - 1, sum_of_values=block_max - base -
                   (len-1)) then codec(freqs - 1, SUM_UNKNOWN)

Block size is 128 for the simple codecs and 256 for ANS (ans_util.hpp:8).
All codecs implement a batch interface so whole Arrow batches of lists
encode/decode with a handful of NumPy calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from partitioned_ef_ans_spark.codecs import ans_msb, vbyte

SUM_UNKNOWN = ans_msb.SUM_UNKNOWN


# ------------------------------------------------------------ block codecs

class U32Codec:
    """Raw u32 passthrough (block_codecs.hpp:309-333) — debug baseline."""

    name = "u32"
    block_size = 128

    def encode_batch(self, blocks, ns, sums) -> list[bytes]:
        return [
            np.asarray(blocks[b, : ns[b]], dtype="<u4").tobytes()
            for b in range(blocks.shape[0])
        ]

    def decode_batch(self, payload, offsets, ns, sums):
        B = len(offsets)
        out = np.zeros((B, self.block_size), dtype=np.uint32)
        sizes = 4 * np.asarray(ns, dtype=np.int64)
        raw = payload.tobytes()
        for b in range(B):
            n = int(ns[b])
            o = int(offsets[b])
            out[b, :n] = np.frombuffer(raw, dtype="<u4", count=n, offset=o)
        return out, sizes


class VByteCodec:
    """TightVariableByte over every block (block_codecs.hpp:335-352)."""

    name = "vbyte"
    block_size = 128

    def encode_batch(self, blocks, ns, sums) -> list[bytes]:
        return [
            vbyte.encode(np.asarray(blocks[b, : ns[b]], dtype=np.uint32))
            for b in range(blocks.shape[0])
        ]

    def decode_batch(self, payload, offsets, ns, sums):
        B = len(offsets)
        out = np.zeros((B, self.block_size), dtype=np.uint32)
        sizes = np.zeros(B, dtype=np.int64)
        for b in range(B):
            n = int(ns[b])
            vals, nxt = vbyte.decode(payload, n, int(offsets[b]))
            out[b, :n] = vals
            sizes[b] = nxt - int(offsets[b])
        return out, sizes


@dataclass
class AnsCodec:
    """ANS-MSB medmax-merged codec (the headline), block size 256."""

    enc: ans_msb.EncModels | None = None
    dec: ans_msb.DecModels | None = None
    name = "ans_msb_medmax_merged"
    block_size = ans_msb.BLOCK_SIZE

    def encode_batch(self, blocks, ns, sums) -> list[bytes]:
        return ans_msb.encode_blocks(blocks, ns, sums, self.enc)

    def decode_batch(self, payload, offsets, ns, sums):
        return ans_msb.decode_blocks(payload, offsets, ns, sums, self.dec)


def _simple16():
    from partitioned_ef_ans_spark.codecs.simple16 import Simple16Codec

    return Simple16Codec()


def _interpolative():
    from partitioned_ef_ans_spark.codecs.interpolative import InterpolativeCodec

    return InterpolativeCodec()


@dataclass
class AnsPackedCodec:
    """ans_packed family (per-magnitude models, A10), block size 256."""

    enc: object | None = None
    dec: object | None = None
    name = "ans_packed_max1d"
    block_size = ans_msb.BLOCK_SIZE

    def encode_batch(self, blk, ns, sums) -> list[bytes]:
        from partitioned_ef_ans_spark.codecs import ans_packed

        return ans_packed.encode_blocks(blk, ns, sums, self.enc)

    def decode_batch(self, payload, offsets, ns, sums):
        from partitioned_ef_ans_spark.codecs import ans_packed

        return ans_packed.decode_blocks(payload, offsets, ns, sums, self.dec)


def _optpfor():
    from partitioned_ef_ans_spark.codecs.optpfor import OptPForCodec

    return OptPForCodec()


def _varintg8iu():
    from partitioned_ef_ans_spark.codecs.varintg8iu import VarintG8IUCodec

    return VarintG8IUCodec()


CODECS = {
    "u32": U32Codec,
    "vbyte": VByteCodec,
    "ans": AnsCodec,
    "simple16": _simple16,
    "interpolative": _interpolative,
    "optpfor": _optpfor,
    "varintg8iu": _varintg8iu,
}


# ------------------------------------------------------- list <-> blocks

def _blockize(doc_ids: np.ndarray, freqs: np.ndarray, block_size: int):
    """One list -> (docs_blocks, freqs_blocks, ns, sums, block_maxs).

    docs values are d-gaps-1, freqs values are tf-1
    (block_posting_list.hpp:163-169).
    """
    n = len(doc_ids)
    docs = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.diff(docs, prepend=-1) - 1  # doc - last_doc - 1
    fr = np.asarray(freqs, dtype=np.int64) - 1
    nblocks = (n + block_size - 1) // block_size
    ns = np.full(nblocks, block_size, dtype=np.int64)
    if n % block_size:
        ns[-1] = n % block_size
    ends = np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1
    block_maxs = docs[ends]
    bases = np.empty(nblocks, dtype=np.int64)
    bases[0] = 0
    bases[1:] = block_maxs[:-1] + 1
    sums = block_maxs - bases - (ns - 1)
    db = np.zeros((nblocks, block_size), dtype=np.uint64)
    fb = np.zeros((nblocks, block_size), dtype=np.uint64)
    for b in range(nblocks):
        s = b * block_size
        e = min(s + block_size, n)
        db[b, : e - s] = gaps[s:e]
        fb[b, : e - s] = fr[s:e]
    return db, fb, ns, sums, block_maxs


def blockize_many(
    doc_lists: list[np.ndarray], freq_lists: list[np.ndarray], block_size: int
):
    """Vectorized batch blockize: all lists of an Arrow batch at once.

    Returns (DB, FB, NS, SUMS, nblocks_per_list, block_maxs_per_list)
    where DB/FB are (total_blocks, block_size) padded transformed
    values, matching per-list :func:`_blockize` exactly.
    """
    L = np.array([len(d) for d in doc_lists], dtype=np.int64)
    nlists = len(doc_lists)
    if nlists == 0:
        z = np.zeros((0, block_size), dtype=np.uint64)
        return z, z.copy(), np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64), []
    docs = np.concatenate(doc_lists).astype(np.int64)
    frs = np.concatenate(freq_lists).astype(np.int64) - 1
    starts = np.concatenate([[0], np.cumsum(L)[:-1]])
    gaps = np.empty_like(docs)
    gaps[1:] = np.diff(docs) - 1
    gaps[0] = docs[0]
    gaps[starts] = docs[starts]  # first element of each list: doc - (-1) - 1

    nblocks = (L + block_size - 1) // block_size
    block_off = np.concatenate([[0], np.cumsum(nblocks)[:-1]])
    total_blocks = int(nblocks.sum())

    # element -> (block row, column)
    pos_in_list = np.arange(len(docs)) - np.repeat(starts, L)
    row = np.repeat(block_off, L) + pos_in_list // block_size
    col = pos_in_list % block_size

    DB = np.zeros((total_blocks, block_size), dtype=np.uint64)
    FB = np.zeros((total_blocks, block_size), dtype=np.uint64)
    DB[row, col] = gaps
    FB[row, col] = frs

    NS = np.full(total_blocks, block_size, dtype=np.int64)
    last_rows = block_off + nblocks - 1
    rem = L % block_size
    NS[last_rows] = np.where(rem == 0, block_size, rem)

    # block maxs: last doc of each block
    blk_list = np.repeat(np.arange(nlists), nblocks)
    blk_in_list = np.arange(total_blocks) - block_off[blk_list]
    end_pos = np.minimum((blk_in_list + 1) * block_size, L[blk_list]) - 1
    maxs = docs[starts[blk_list] + end_pos]
    # bases for block b>0 = prev block's max + 1 (within the same list)
    prev_max = np.empty(total_blocks, dtype=np.int64)
    prev_max[1:] = maxs[:-1]
    prev_max[block_off] = -1
    bases = np.where(blk_in_list == 0, 0, prev_max + 1)
    SUMS = maxs - bases - (NS - 1)
    block_maxs = [maxs[block_off[i] : block_off[i] + nblocks[i]] for i in range(nlists)]
    return DB, FB, NS, SUMS, nblocks, block_maxs


def write_lists(
    doc_lists: list[np.ndarray], freq_lists: list[np.ndarray], codec
) -> list[bytes]:
    """Encode many posting lists; one payload per list.

    All blocks of all lists go through the codec in two batch calls
    (docs, freqs) — the vectorization boundary is the Arrow batch, not
    the list.
    """
    bs = codec.block_size
    DB, FB, NS, SUMS, nblocks, block_maxs = blockize_many(doc_lists, freq_lists, bs)
    metas = [
        (len(doc_lists[i]), block_maxs[i], int(nblocks[i]))
        for i in range(len(doc_lists))
    ]
    doc_payloads = codec.encode_batch(DB, NS, SUMS)
    freq_payloads = codec.encode_batch(
        FB, NS, np.full(len(NS), SUM_UNKNOWN, dtype=np.int64)
    )
    out: list[bytes] = []
    pos = 0
    for n, maxs, nblocks in metas:
        parts = [vbyte.encode_single(n), maxs.astype("<u4").tobytes()]
        block_bytes = [
            doc_payloads[pos + b] + freq_payloads[pos + b] for b in range(nblocks)
        ]
        endpoints = np.cumsum([len(bb) for bb in block_bytes[:-1]])
        parts.append(endpoints.astype("<u4").tobytes())
        parts.extend(block_bytes)
        out.append(b"".join(parts))
        pos += nblocks
    return out


def read_list_headers(payload: np.ndarray, codec):
    """Parse (n, block_maxs, payload_start, block_offsets) of one list."""
    n, off = vbyte.decode_single(payload, 0)
    bs = codec.block_size
    nblocks = (n + bs - 1) // bs
    raw = payload.tobytes()
    maxs = np.frombuffer(raw, dtype="<u4", count=nblocks, offset=off)
    off2 = off + 4 * nblocks
    endpoints = np.frombuffer(raw, dtype="<u4", count=nblocks - 1, offset=off2)
    payload_start = off2 + 4 * (nblocks - 1)
    block_offsets = np.zeros(nblocks, dtype=np.int64)
    block_offsets[1:] = endpoints
    block_offsets += payload_start
    return n, maxs, block_offsets


def decode_lists(payloads: list[bytes], codec) -> list[tuple[np.ndarray, np.ndarray]]:
    """Decode many lists back to (doc_ids, freqs) arrays.

    Batch discipline mirrors write_lists: every docs block of every
    list decodes in one codec call, then every freqs block.
    """
    bs = codec.block_size
    bufs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
    metas = []
    for buf in bufs:
        n, maxs, block_offsets = read_list_headers(buf, codec)
        metas.append((n, maxs, block_offsets))

    # concatenate payload buffers so one decode pass covers everything
    offsets_global = np.cumsum([0] + [len(b) for b in bufs[:-1]])
    big = np.concatenate(bufs) if bufs else np.empty(0, dtype=np.uint8)

    blk_off, blk_ns, blk_sums, blk_list = [], [], [], []
    for li, (n, maxs, block_offsets) in enumerate(metas):
        nblocks = len(block_offsets)
        ns = np.full(nblocks, bs, dtype=np.int64)
        if n % bs:
            ns[-1] = n % bs
        bases = np.empty(nblocks, dtype=np.int64)
        bases[0] = 0
        bases[1:] = maxs[:-1].astype(np.int64) + 1
        sums = maxs.astype(np.int64) - bases - (ns - 1)
        blk_off.append(block_offsets + offsets_global[li])
        blk_ns.append(ns)
        blk_sums.append(sums)
        blk_list.append(np.full(nblocks, li, dtype=np.int64))
    OFF = np.concatenate(blk_off)
    NS = np.concatenate(blk_ns)
    SUMS = np.concatenate(blk_sums)
    LIST = np.concatenate(blk_list)

    doc_vals, doc_sizes = codec.decode_batch(big, OFF, NS, SUMS)
    freq_off = OFF + doc_sizes
    freq_vals, _ = codec.decode_batch(
        big, freq_off, NS, np.full(len(NS), SUM_UNKNOWN, dtype=np.int64)
    )

    out = []
    for li, (n, maxs, _) in enumerate(metas):
        sel = LIST == li
        dv = doc_vals[sel]
        fv = freq_vals[sel]
        ns = NS[sel]
        gaps = np.concatenate([dv[b, : ns[b]] for b in range(len(ns))])
        docs = np.cumsum(gaps.astype(np.int64) + 1) - 1
        freqs = np.concatenate([fv[b, : ns[b]] for b in range(len(ns))]).astype(
            np.int64
        ) + 1
        out.append((docs, freqs))
    return out
