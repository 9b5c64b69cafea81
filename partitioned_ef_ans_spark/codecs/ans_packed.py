"""ans_packed entropy codec family (A10) — NumPy reimplementation.

Reference: ans_packed_util.hpp:15-601 + ans_packed_model.hpp:17-421,
wired as block_anspacked = ans_packed_model<model_max_1d>
(index_types.hpp:55).  Unlike ans_msb there is no MSB mapping or
exception stream: symbols are the raw values v = in+1 and every value
inside a magnitude bucket shares one frequency — models are
per-magnitude tables (33 bins), normalized by the reference's
three-phase bucket scaling (normalize_counts,
ans_packed_util.hpp:283-377), frame M = sum(counts[m] * uniq(m))
rounded to a power of two, norm_lower_bound = max(2^24, M) per model.

The reference keeps two table layouts (full value-indexed vs compact
per-magnitude) chosen by max_value thresholds; both produce the SAME
byte stream (table[v].base == base[mag] + freq*(v - min_val(mag)),
same SUB per magnitude), so this port implements the compact
arithmetic everywhere — encode via per-magnitude gathers, decode via
a vectorized searchsorted over the <=33 active magnitude bases.

Model selection/header = model_max_1d (16 models,
pack_two_4bit(model_id, fsb) byte + nwords byte); block special paths
(sum==0, short docs lists -> vbyte, model 0, n==1) match
ans_block_posting_list.hpp exactly like codecs/ans_msb.py.

Execution model mirrors ans_msb.py: interleaved rANS across all
blocks of an Arrow batch (one NumPy step per symbol position).

Documented divergence: normalize_counts' second phase divides by
nfreqs->counts[0] even when magnitude 0 is empty (C++ UB via inf);
this port uses C=0 in that case (the branch only triggers past
TOPFREQ=2^20 postings in one model's minimum magnitude).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from partitioned_ef_ans_spark.codecs import vbyte
from partitioned_ef_ans_spark.codecs.ans_msb import (
    BLOCK_SIZE,
    MAG2SEL,
    OUTPUT_BASE_LOG2,
    SUM_UNKNOWN,
    VBYTE_THRESHOLD,
    _state_bytes,
    magnitude,
)

MAX_MAG = 32
NUM_MODELS = 16
TOPFREQ = 1 << 20
NORM_LOWER_BOUND = np.uint64(1 << 24)


def min_val_in_mag(mag: int) -> int:
    return 1 if mag == 0 else (1 << (mag - 1)) + 1


def max_val_in_mag(mag: int, max_value: int) -> int:
    mv = 1 if mag == 0 else (1 << mag)
    return min(mv, max_value)


def uniq_vals_in_mag(mag: int, max_value: int) -> int:
    return max_val_in_mag(mag, max_value) - min_val_in_mag(mag) + 1


MIN_VAL = np.array([min_val_in_mag(m) for m in range(MAX_MAG + 1)], dtype=np.int64)


# ----------------------------------------------------------- training

def new_counts() -> tuple[np.ndarray, np.ndarray]:
    """(counts (16, 33) uint64, max_value (16,) uint32)."""
    return (
        np.zeros((NUM_MODELS, MAX_MAG + 1), dtype=np.uint64),
        np.zeros(NUM_MODELS, dtype=np.uint32),
    )


def pick_model_max1d(blocks: np.ndarray, ns: np.ndarray) -> np.ndarray:
    """model_max_1d::pick_model (ans_packed_model.hpp:19-27)."""
    pad = blocks.astype(np.int64, copy=True)
    idx = np.arange(blocks.shape[1])[None, :]
    pad[idx >= ns[:, None]] = -1
    mx = pad.max(axis=1).astype(np.uint64)
    return MAG2SEL[magnitude(mx + np.uint64(1))].astype(np.uint32)


def accumulate_counts(
    counts: np.ndarray,
    max_value: np.ndarray,
    blocks: np.ndarray,
    ns: np.ndarray,
    sums: np.ndarray,
) -> None:
    """ans_packed_model::model (ans_packed_model.hpp:242-256); docs
    lists short enough for the vbyte path are excluded like ans_msb."""
    keep = ~((sums != SUM_UNKNOWN) & (ns <= VBYTE_THRESHOLD))
    if not np.any(keep):
        return
    blocks = blocks[keep]
    ns = ns[keep]
    models = pick_model_max1d(blocks, ns)
    valid = np.arange(blocks.shape[1])[None, :] < ns[:, None]
    vals = blocks[valid].astype(np.int64, copy=False) + 1
    mags = magnitude(vals.astype(np.uint64)).astype(np.int64)
    mid = np.broadcast_to(models[:, None], valid.shape)[valid].astype(np.int64)
    flat = mid * (MAX_MAG + 1) + mags
    counts += np.bincount(flat, minlength=counts.size).reshape(
        counts.shape
    ).astype(np.uint64)
    for m in range(NUM_MODELS):
        sel = mid == m
        if np.any(sel):
            max_value[m] = max(int(max_value[m]), int(vals[sel].max()))


def normalize_counts(cnts: np.ndarray, max_value: int) -> np.ndarray:
    """Faithful port of ans_packed::normalize_counts
    (ans_packed_util.hpp:283-377): three-phase per-magnitude scaling to
    a power-of-two frame."""
    nf = [int(x) for x in cnts]
    nz = [m for m in range(MAX_MAG + 1) if nf[m] != 0]
    min_mag, max_mag = nz[0], nz[-1]

    bucket = uniq_vals_in_mag(max_mag, max_value)
    C = 0.5 * bucket / nf[max_mag]
    for m in range(min_mag, max_mag + 1):
        b = uniq_vals_in_mag(m, max_value)
        scaled = int(0.5 + cnts[m] * C / b)
        if cnts[m] != 0 and scaled < 1:
            scaled = 1
        nf[m] = scaled
    if nf[min_mag] > TOPFREQ:
        C2 = (1.0 * TOPFREQ / nf[0]) if nf[0] else 0.0  # see module docstring
        nf[min_mag] = TOPFREQ
        for m in range(min_mag + 1, max_mag + 1):
            scaled = int(0.5 + nf[m] * C2)
            if cnts[m] != 0 and scaled == 0:
                scaled = 1
            nf[m] = scaled

    M = sum(nf[m] * uniq_vals_in_mag(m, max_value) for m in range(min_mag, max_mag + 1))
    target = 1 << (M - 1).bit_length() if M & (M - 1) else M
    excess = target - M
    for m in range(max_mag, min_mag - 1, -1):
        ratio = 1.0 * excess / M
        adder = int(ratio * nf[m])
        u = uniq_vals_in_mag(m, max_value)
        excess -= u * adder
        M -= u * nf[m]
        nf[m] += adder
    if excess:
        if min_mag != 0:
            u = uniq_vals_in_mag(min_mag, max_value)
            e_min = excess // u
            excess -= e_min * u
            nf[min_mag] += e_min
        nf[0] += excess
    total = sum(nf[m] * uniq_vals_in_mag(m, max_value) for m in range(MAX_MAG + 1) if nf[m])
    assert total & (total - 1) == 0, "not a power of two after normalization"
    return np.array(nf, dtype=np.uint64)


# ------------------------------------------------------- frozen models

@dataclass
class PackedEnc:
    """Per-model per-magnitude tables, stacked [model, mag]."""

    NFREQ: np.ndarray      # uint64 (16, 33)
    BASE: np.ndarray       # uint64 (16, 33)
    SUB: np.ndarray        # uint64 (16, 33)
    M: np.ndarray          # uint64 (16,)
    NLB: np.ndarray        # uint64 (16,)  norm_lower_bound per model
    max_value: np.ndarray  # uint32 (16,)


@dataclass
class PackedDec:
    NFREQ: np.ndarray      # uint64 (16, 33)
    ABASE: np.ndarray      # int64 (16, 34) active-mag base values asc, +inf pad
    AMAG: np.ndarray       # int64 (16, 34) active mag per ABASE slot
    M: np.ndarray
    log2_M: np.ndarray
    mask_M: np.ndarray
    NLB: np.ndarray


def freeze_models(counts: np.ndarray, max_value: np.ndarray) -> tuple[PackedEnc, PackedDec]:
    NFREQ = np.zeros((NUM_MODELS, MAX_MAG + 1), dtype=np.uint64)
    BASE = np.zeros((NUM_MODELS, MAX_MAG + 1), dtype=np.uint64)
    SUB = np.zeros((NUM_MODELS, MAX_MAG + 1), dtype=np.uint64)
    M = np.zeros(NUM_MODELS, dtype=np.uint64)
    NLB = np.zeros(NUM_MODELS, dtype=np.uint64)
    ABASE = np.full((NUM_MODELS, MAX_MAG + 2), np.iinfo(np.int64).max, dtype=np.int64)
    AMAG = np.zeros((NUM_MODELS, MAX_MAG + 2), dtype=np.int64)
    for i in range(1, NUM_MODELS):  # model 0 is the all-ones selector
        if counts[i].sum() == 0:
            continue
        mv = int(max_value[i])
        nf = normalize_counts(counts[i], mv)
        NFREQ[i] = nf
        cumsum = 0
        j = 0
        for m in range(MAX_MAG + 1):
            if nf[m] == 0:
                continue
            BASE[i, m] = cumsum
            ABASE[i, j] = cumsum
            AMAG[i, j] = m
            cumsum += uniq_vals_in_mag(m, mv) * int(nf[m])
            j += 1
        M[i] = cumsum
        nlb = max(int(NORM_LOWER_BOUND), cumsum)
        NLB[i] = nlb
        SUB[i] = np.uint64((nlb // cumsum) * (1 << OUTPUT_BASE_LOG2)) * nf
    log2_M = np.zeros(NUM_MODELS, dtype=np.uint64)
    nzm = M > 0
    log2_M[nzm] = np.array(
        [int(x).bit_length() - 1 for x in M[nzm]], dtype=np.uint64
    )
    enc = PackedEnc(NFREQ=NFREQ, BASE=BASE, SUB=SUB, M=M, NLB=NLB,
                    max_value=max_value.copy())
    dec = PackedDec(
        NFREQ=NFREQ, ABASE=ABASE, AMAG=AMAG, M=M, log2_M=log2_M,
        mask_M=np.where(nzm, M - np.uint64(1), np.uint64(0)).astype(np.uint64),
        NLB=NLB,
    )
    return enc, dec


# --------------------------------------------------- batch encode/decode

def encode_blocks(
    blocks: np.ndarray, ns: np.ndarray, sums: np.ndarray, enc: PackedEnc
) -> list[bytes]:
    B = blocks.shape[0]
    ns = np.asarray(ns, dtype=np.int64)
    sums = np.asarray(sums, dtype=np.int64)
    blocks = np.asarray(blocks, dtype=np.uint64)
    out: list[bytes | None] = [None] * B

    zero_sum = sums == 0
    vb = (sums != SUM_UNKNOWN) & (ns <= VBYTE_THRESHOLD) & ~zero_sum
    for b in np.flatnonzero(zero_sum):
        out[b] = b""
    for b in np.flatnonzero(vb):
        n = int(ns[b])
        out[b] = b"" if n == 1 else vbyte.encode(blocks[b, :n].astype(np.uint32))

    idx = np.flatnonzero(~(zero_sum | vb))
    if idx.size == 0:
        return out  # type: ignore[return-value]
    ab = blocks[idx]
    an = ns[idx]
    mid = pick_model_max1d(ab, an).astype(np.int64)
    m0 = mid == 0
    for b in idx[m0]:
        out[b] = b"\x00"
    live = ~m0
    idx, ab, an, mid = idx[live], ab[live], an[live], mid[live]
    if idx.size == 0:
        return out  # type: ignore[return-value]
    nb = idx.size

    vals = (ab + np.uint64(1)).astype(np.int64)
    mags = magnitude(vals.astype(np.uint64)).astype(np.int64)

    states = np.zeros(nb, dtype=np.uint64)
    words = np.zeros((nb, BLOCK_SIZE), dtype=np.uint32)
    wcount = np.zeros(nb, dtype=np.int64)
    rows = np.arange(nb)
    maxn = int(an.max())
    for k in range(maxn):
        alive = k < an
        col = np.where(alive, an - 1 - k, 0)
        v = vals[rows, col]
        mg = mags[rows, col]
        f = enc.NFREQ[mid, mg]
        base = enc.BASE[mid, mg] + f * (v - MIN_VAL[mg]).astype(np.uint64)
        sub = enc.SUB[mid, mg]
        flush = alive & (states >= sub)
        if np.any(flush):
            words[rows[flush], wcount[flush]] = (
                states[flush] & np.uint64(0xFFFFFFFF)
            ).astype(np.uint32)
            wcount[flush] += 1
            states[flush] >>= np.uint64(OUTPUT_BASE_LOG2)
        fsafe = np.where(alive, f, np.uint64(1))
        nxt = (states // fsafe) * enc.M[mid] + states % fsafe + base
        states = np.where(alive, nxt, states)

    fsb = np.maximum(_state_bytes(states), 1)
    assert np.all(wcount <= 255), "ANS u32 count exceeds 1-byte header field"

    for r in range(nb):
        b = int(idx[r])
        f_bytes = int(fsb[r])
        # packed1 header: (model_id<<4 | fsb), nwords
        parts = [bytes([(int(mid[r]) << 4) | f_bytes, int(wcount[r])])]
        st = int(states[r])
        parts.append(st.to_bytes(8, "big")[8 - f_bytes :])
        if wcount[r]:
            parts.append(words[r, : wcount[r]][::-1].astype("<u4").tobytes())
        out[b] = b"".join(parts)
    return out  # type: ignore[return-value]


def decode_blocks(
    payload: np.ndarray,
    offsets: np.ndarray,
    ns: np.ndarray,
    sums: np.ndarray,
    dec: PackedDec,
):
    payload = np.asarray(payload, dtype=np.uint8)
    B = len(offsets)
    ns = np.asarray(ns, dtype=np.int64)
    sums = np.asarray(sums, dtype=np.int64)
    out = np.zeros((B, BLOCK_SIZE), dtype=np.uint32)
    sizes = np.zeros(B, dtype=np.int64)

    zero_sum = sums == 0
    vb = (sums != SUM_UNKNOWN) & (ns <= VBYTE_THRESHOLD) & ~zero_sum
    for b in np.flatnonzero(vb):
        n = int(ns[b])
        if n == 1:
            out[b, 0] = np.uint32(sums[b])
        else:
            vals, nxt = vbyte.decode(payload, n, int(offsets[b]))
            out[b, :n] = vals
            sizes[b] = nxt - int(offsets[b])
    ans_idx = np.flatnonzero(~(zero_sum | vb))
    if ans_idx.size == 0:
        return out, sizes

    off = np.asarray(offsets, dtype=np.int64)[ans_idx]
    first = payload[off]
    live = first != 0
    sizes[ans_idx[~live]] = 1
    ans_idx = ans_idx[live]
    if ans_idx.size == 0:
        return out, sizes
    off = off[live]
    mid = (payload[off] >> 4).astype(np.int64)
    fsb = (payload[off] & 0xF).astype(np.int64)
    nwords = payload[off + 1].astype(np.int64)
    nb = ans_idx.size
    an = ns[ans_idx]

    states = np.zeros(nb, dtype=np.uint64)
    p = off + 2
    for i in range(8):
        m = i < fsb
        states[m] = (states[m] << np.uint64(8)) | payload[p[m] + i].astype(np.uint64)
    wstart = p + fsb

    maxw = int(nwords.max()) if nb else 0
    words = np.zeros((nb, max(maxw, 1)), dtype=np.uint64)
    for w in range(maxw):
        m = w < nwords
        base = wstart[m] + 4 * w
        words[m, w] = (
            payload[base].astype(np.uint64)
            | (payload[base + 1].astype(np.uint64) << np.uint64(8))
            | (payload[base + 2].astype(np.uint64) << np.uint64(16))
            | (payload[base + 3].astype(np.uint64) << np.uint64(24))
        )

    rows = np.arange(nb)
    rptr = np.zeros(nb, dtype=np.int64)
    remaining = nwords.copy()
    mask_M = dec.mask_M[mid]
    log2_M = dec.log2_M[mid]
    nlb = dec.NLB[mid]
    abase = dec.ABASE[mid]  # (nb, 34)
    amag = dec.AMAG[mid]
    maxn = int(an.max())
    for k in range(maxn):
        alive = k < an
        smod = (states & mask_M).astype(np.int64)
        # find_mag: last active base <= state_mod_M (vectorized over
        # the <=33 active magnitudes)
        j = (abase <= smod[:, None]).sum(axis=1) - 1
        mg = amag[rows, j]
        f = dec.NFREQ[mid, mg]
        mag_off = (smod - abase[rows, j]).astype(np.uint64)
        offset = mag_off % f
        num_off = mag_off // f
        num = MIN_VAL[mg].astype(np.uint64) + num_off
        nxt = f * (states >> log2_M) + offset
        states = np.where(alive, nxt, states)
        out[ans_idx[alive], k] = (num[alive] - np.uint64(1)).astype(np.uint32)
        need = alive & (remaining > 0) & (states < nlb)
        if np.any(need):
            w = words[rows[need], rptr[need]]
            states[need] = (states[need] << np.uint64(OUTPUT_BASE_LOG2)) | w
            rptr[need] += 1
            remaining[need] -= 1

    sizes[ans_idx] = 2 + fsb + 4 * nwords
    return out, sizes
