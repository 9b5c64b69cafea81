"""Partitioned Elias-Fano sequence codecs (NumPy bit kernels).

Faithful reimplementation of the reference's EF family layouts and size
formulas:

  compact_elias_fano      (compact_elias_fano.hpp:12-138)
  strict_elias_fano       (strict_elias_fano.hpp:10-83, v_i - i transform)
  compact_ranked_bitvector(compact_ranked_bitvector.hpp:12-120)
  all_ones_sequence       (all_ones_sequence.hpp)
  indexed_sequence        (cost-based selector, indexed_sequence.hpp:42-86)
  strict_sequence         (strict params: no 0-pointers, strict_sequence.hpp)
  positive_sequence       (prefix-sum wrapper, positive_sequence.hpp)
  optimal_partition       (the space-optimal DP, optimal_partition.hpp:70-125)
  partitioned_sequence    (partitioned_sequence.hpp:21-120)
  uniform partitioning    (fixed 2^7 chunks, uniform_partitioned_sequence.hpp)

Bit conventions follow succinct::bit_vector (LSB-first within 64-bit
words); γ/δ codes follow integer_codes.hpp.  All ``bitsize`` formulas —
including the sampled-pointer areas — are reproduced exactly, so
partition decisions and bits-per-posting match the reference.  The
pointer areas are POPULATED at write time (0-pointers = sampled zero
positions, 1-pointers = sampled one positions) and power the lazy
``ef_next_geq``/``ef_select`` enumerator operations (Q12,
compact_elias_fano.hpp:264-335); the batch decode path still
reconstructs whole sequences vectorized (Arrow-batch execution wins
there, SURVEY.md §4).

Knobs (global_parameters.hpp:6-13, configuration.hpp:28-31):
ef_log_sampling0=9, ef_log_sampling1=8, rb_log_rank1_sampling=9,
rb_log_sampling1=8, log_partition_size=7, eps1=0.03, eps2=0.3,
fix_cost=64.  The DP knobs are env-tunable under the REFERENCE'S OWN
variable names (QS_EPS1/QS_EPS2/QS_FIXCOST — configuration.hpp's
fillvar), read once at import like the reference's singleton; they
only steer the partition CHOICE (the encoded stream is
self-describing), so indexes built under different eps settings stay
decode-compatible.  QS_LOG_PART is deliberately NOT env-read: the
uniform family's partition step is implied, not stored, so changing
it between encode and decode would corrupt payloads.
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass

import numpy as np

EF_LOG_SAMPLING0 = 9
EF_LOG_SAMPLING1 = 8
RB_LOG_RANK1_SAMPLING = 9
RB_LOG_SAMPLING1 = 8
LOG_PARTITION_SIZE = 7
EPS1 = float(_os.environ.get("QS_EPS1") or 0.03)
EPS2 = float(_os.environ.get("QS_EPS2") or 0.3)
FIX_COST = int(_os.environ.get("QS_FIXCOST") or 64)

U64 = np.uint64
_ONE = np.uint64(1)


def ceil_log2(x: int) -> int:
    return max(0, int(x - 1).bit_length()) if x > 1 else 0


def msb(x: int) -> int:
    return int(x).bit_length() - 1


# ------------------------------------------------------------------ bit io

class BitWriter:
    """Append/set bit fields LSB-first in 64-bit words."""

    def __init__(self):
        self.words = np.zeros(16, dtype=np.uint64)
        self.size = 0  # bits

    def _ensure(self, bits: int) -> None:
        need = (bits + 63) >> 6
        if need > len(self.words):
            self.words = np.resize(self.words, max(need, 2 * len(self.words)))
            # np.resize fills with repeats; zero the tail explicitly
        # (we only ever OR into fresh area that zero_extend touched)

    def zero_extend(self, nbits: int) -> None:
        new_size = self.size + nbits
        # +1 spare word: vectorized spill writes may touch one word past
        # the last occupied one (with zero payload)
        need = ((new_size + 63) >> 6) + 1
        if need > len(self.words):
            old = self.words
            self.words = np.zeros(max(need, 2 * len(old)), dtype=np.uint64)
            self.words[: len(old)] = old
        self.size = new_size

    def set_bits(self, offset: int, value: int, width: int) -> None:
        if width == 0:
            return
        value = int(value) & ((1 << width) - 1)
        w, s = offset >> 6, offset & 63
        self.words[w] |= U64((value << s) & 0xFFFFFFFFFFFFFFFF)
        if s + width > 64:
            self.words[w + 1] |= U64(value >> (64 - s))

    def set_bit(self, offset: int) -> None:
        self.words[offset >> 6] |= _ONE << U64(offset & 63)

    def append_bits(self, value: int, width: int) -> None:
        off = self.size
        self.zero_extend(width)
        self.set_bits(off, value, width)

    def set_bits_vec(self, offsets: np.ndarray, values: np.ndarray, width: int) -> None:
        """OR many disjoint ``width``-bit fields (vectorized)."""
        if width == 0 or len(offsets) == 0:
            return
        offsets = offsets.astype(np.int64)
        values = values.astype(np.uint64) & U64((1 << width) - 1)
        w = offsets >> 6
        s = (offsets & 63).astype(np.uint64)
        lo = (values << s).astype(np.uint64)
        np.bitwise_or.at(self.words, w, lo)
        spill = (offsets & 63) + width > 64
        if np.any(spill):
            hs = (U64(64) - s[spill]).astype(np.uint64)
            np.bitwise_or.at(self.words, w[spill] + 1, values[spill] >> hs)

    def set_bits_at(self, positions: np.ndarray) -> None:
        """Set single bits at many positions (vectorized)."""
        if len(positions) == 0:
            return
        positions = positions.astype(np.int64)
        np.bitwise_or.at(
            self.words, positions >> 6, _ONE << (positions & 63).astype(np.uint64)
        )

    def append_writer(self, other: "BitWriter") -> None:
        off = self.size
        self.zero_extend(other.size)
        # word-misaligned OR: shift other's words into place
        nwords = (other.size + 63) >> 6
        ow = other.words[:nwords]
        w, s = off >> 6, off & 63
        if s == 0:
            np.bitwise_or.at(self.words, w + np.arange(nwords), ow)
        else:
            sh = np.uint64(s)
            np.bitwise_or.at(self.words, w + np.arange(nwords), ow << sh)
            np.bitwise_or.at(
                self.words, w + np.arange(nwords) + 1, ow >> np.uint64(64 - s)
            )

    def tobytes(self) -> bytes:
        nwords = (self.size + 63) >> 6
        return self.words[:nwords].tobytes()


class BitReader:
    def __init__(self, buf: bytes | np.ndarray):
        b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, dtype=np.uint8)
        pad = (-len(b)) % 8
        if pad:
            b = np.concatenate([b, np.zeros(pad, dtype=np.uint8)])
        self.words = b.view(np.uint64)
        self.nbits = len(b) * 8
        self.pos = 0  # cursor for sequential reads

    def read_bits(self, offset: int, width: int) -> int:
        if width == 0:
            return 0
        w, s = offset >> 6, offset & 63
        val = int(self.words[w]) >> s
        if s + width > 64:
            val |= int(self.words[w + 1]) << (64 - s)
        return val & ((1 << width) - 1)

    def take(self, width: int) -> int:
        v = self.read_bits(self.pos, width)
        self.pos += width
        return v

    def skip_zeros(self) -> int:
        """Count zeros up to and including the terminating 1 bit
        (succinct enumerator semantics for γ decode)."""
        start = self.pos
        while True:
            w, s = self.pos >> 6, self.pos & 63
            chunk = int(self.words[w]) >> s
            if chunk:
                tz = (chunk & -chunk).bit_length() - 1
                self.pos += tz + 1
                return self.pos - start - 1
            self.pos += 64 - s

    def read_fields_vec(self, offsets: np.ndarray, width: int) -> np.ndarray:
        if width == 0:
            return np.zeros(len(offsets), dtype=np.uint64)
        offsets = offsets.astype(np.int64)
        w = offsets >> 6
        s = (offsets & 63).astype(np.uint64)
        lo = self.words[w] >> s
        hi = np.where(
            (offsets & 63) + width > 64,
            self.words[np.minimum(w + 1, len(self.words) - 1)]
            << (U64(64) - s).astype(np.uint64),
            U64(0),
        )
        mask = U64((1 << width) - 1) if width < 64 else U64(0xFFFFFFFFFFFFFFFF)
        return (lo | hi) & mask

    def ones_in_window(self, start: int, length: int) -> np.ndarray:
        """Positions (relative to start) of set bits in [start, start+length)."""
        if length <= 0:
            return np.empty(0, dtype=np.int64)
        first_byte = start >> 3
        last_byte = (start + length + 7) >> 3
        window = np.unpackbits(
            self.words.view(np.uint8)[first_byte:last_byte], bitorder="little"
        )
        off = start - (first_byte << 3)
        window = window[off : off + length]
        return np.flatnonzero(window)


# ------------------------------------------------------------- gamma/delta

def write_gamma(bw: BitWriter, n: int) -> None:
    nn = n + 1
    l = msb(nn)
    bw.append_bits(1 << l, l + 1)
    bw.append_bits(nn ^ (1 << l), l)


def write_gamma_nonzero(bw: BitWriter, n: int) -> None:
    write_gamma(bw, n - 1)


def read_gamma(br: BitReader) -> int:
    l = br.skip_zeros()
    return (br.take(l) | (1 << l)) - 1


def read_gamma_nonzero(br: BitReader) -> int:
    return read_gamma(br) + 1


def write_delta(bw: BitWriter, n: int) -> None:
    nn = n + 1
    l = msb(nn)
    write_gamma(bw, l)
    bw.append_bits(nn ^ (1 << l), l)


def read_delta(br: BitReader) -> int:
    l = read_gamma(br)
    return (br.take(l) | (1 << l)) - 1


# -------------------------------------------------------- compact Elias-Fano

@dataclass
class EFOffsets:
    universe: int
    n: int
    lower_bits: int
    higher_bits_length: int
    pointer_size: int
    pointers0: int
    pointers1: int
    pointers0_offset: int
    pointers1_offset: int
    higher_bits_offset: int
    lower_bits_offset: int
    end: int


def ef_offsets(base: int, universe: int, n: int, log_s0=EF_LOG_SAMPLING0, log_s1=EF_LOG_SAMPLING1) -> EFOffsets:
    lower_bits = msb(universe // n) if universe > n else 0
    higher_bits_length = n + (universe >> lower_bits) + 2
    pointer_size = ceil_log2(higher_bits_length)
    pointers0 = (higher_bits_length - n) >> log_s0
    pointers1 = n >> log_s1
    p0_off = base
    p1_off = p0_off + pointers0 * pointer_size
    hb_off = p1_off + pointers1 * pointer_size
    lb_off = hb_off + higher_bits_length
    return EFOffsets(
        universe, n, lower_bits, higher_bits_length, pointer_size,
        pointers0, pointers1, p0_off, p1_off, hb_off, lb_off,
        lb_off + n * lower_bits,
    )


def ef_bitsize(universe: int, n: int, log_s0=EF_LOG_SAMPLING0, log_s1=EF_LOG_SAMPLING1) -> int:
    return ef_offsets(0, universe, n, log_s0, log_s1).end


def ef_write(bw: BitWriter, values: np.ndarray, universe: int, n: int,
             log_s0=EF_LOG_SAMPLING0, log_s1=EF_LOG_SAMPLING1) -> None:
    assert n > 0
    of = ef_offsets(bw.size, universe, n, log_s0, log_s1)
    bw.zero_extend(of.end - bw.size)
    v = np.asarray(values, dtype=np.int64)
    high = (v >> of.lower_bits) + np.arange(1, n + 1)
    bw.set_bits_at(of.higher_bits_offset + high)
    if of.lower_bits:
        lows = v & ((1 << of.lower_bits) - 1)
        offs = of.lower_bits_offset + np.arange(n, dtype=np.int64) * of.lower_bits
        bw.set_bits_vec(offs, lows.astype(np.uint64), of.lower_bits)
    # skip pointers (compact_elias_fano.hpp:264-335 sampling):
    # pointers0[i] = high-bits position of the ((i+1) << log_s0)-th
    # zero (powers next_geq's jump to a high-value group), pointers1[i]
    # = position of the ((i+1) << log_s1)-th one (powers select/move).
    # Vectorized: the z-th zero sits at z - 1 + |{j : o_j - j < z}|.
    if of.pointers0:
        z = (np.arange(1, of.pointers0 + 1, dtype=np.int64)) << log_s0
        zeros_before_one = high - np.arange(n)  # o_j - j, non-decreasing
        r = np.searchsorted(zeros_before_one, z, side="left")
        p0 = z - 1 + r
        offs0 = of.pointers0_offset + np.arange(of.pointers0, dtype=np.int64) * of.pointer_size
        bw.set_bits_vec(offs0, p0.astype(np.uint64), of.pointer_size)
    if of.pointers1:
        k = (np.arange(1, of.pointers1 + 1, dtype=np.int64) << log_s1) - 1
        offs1 = of.pointers1_offset + np.arange(of.pointers1, dtype=np.int64) * of.pointer_size
        bw.set_bits_vec(offs1, high[k].astype(np.uint64), of.pointer_size)


def ef_decode(br: BitReader, base: int, universe: int, n: int,
              log_s0=EF_LOG_SAMPLING0, log_s1=EF_LOG_SAMPLING1) -> np.ndarray:
    of = ef_offsets(base, universe, n, log_s0, log_s1)
    ones = br.ones_in_window(of.higher_bits_offset, of.higher_bits_length)
    assert len(ones) == n, f"EF decode: expected {n} ones, got {len(ones)}"
    high = ones - np.arange(1, n + 1)
    if of.lower_bits:
        offs = of.lower_bits_offset + np.arange(n, dtype=np.int64) * of.lower_bits
        lows = br.read_fields_vec(offs, of.lower_bits).astype(np.int64)
    else:
        lows = np.zeros(n, dtype=np.int64)
    return (high << of.lower_bits) | lows


def _ef_low(br: BitReader, of: EFOffsets, idx: int) -> int:
    if not of.lower_bits:
        return 0
    return br.read_bits(
        of.lower_bits_offset + idx * of.lower_bits, of.lower_bits
    )


def _scan_zeros(br: BitReader, of: EFOffsets, pos: int, zeros_seen: int, target: int) -> tuple[int, int]:
    """Advance ``pos`` (relative to the high-bits area) until
    ``target`` zeros have been consumed; returns (pos, zeros_seen) with
    pos just past the target-th zero.  Word-at-a-time popcounts, so the
    gap between two skip pointers (<= 2^log_s0 zeros) costs a handful
    of 64-bit reads, not a per-bit loop."""
    hb = of.higher_bits_offset
    while zeros_seen < target and pos < of.higher_bits_length:
        width = min(64, of.higher_bits_length - pos)
        word = br.read_bits(hb + pos, width)
        zw = width - int(word).bit_count()
        if zeros_seen + zw < target:
            zeros_seen += zw
            pos += width
            continue
        # target zero is inside this word: bit scan
        for b in range(width):
            pos += 1
            if not (word >> b) & 1:
                zeros_seen += 1
                if zeros_seen == target:
                    return pos, zeros_seen
        break
    return pos, zeros_seen


def ef_next_geq(br: BitReader, base: int, universe: int, n: int, lb: int,
                log_s0=EF_LOG_SAMPLING0, log_s1=EF_LOG_SAMPLING1) -> tuple[int, int]:
    """(index, value) of the first element >= ``lb`` WITHOUT decoding
    the sequence — the reference enumerator's next_geq
    (compact_elias_fano.hpp:264-335): jump close to the lb's high-bits
    group via the sampled 0-pointers, scan to the group start, then
    check at most the ones inside that group.  Returns (n, universe)
    when exhausted.  This is the lazy skip behavior (Q12); the
    vectorized whole-list ef_decode remains the batch path."""
    of = ef_offsets(base, universe, n, log_s0, log_s1)
    if lb <= 0:
        return 0, int(ef_select(br, base, universe, n, 0, log_s0, log_s1))
    if lb > universe:
        return n, universe
    h_lb = lb >> of.lower_bits
    pos, zeros_seen = 0, 0
    if h_lb > 0:
        j = min(h_lb >> log_s0, of.pointers0)
        if j > 0:
            ptr = br.read_bits(
                of.pointers0_offset + (j - 1) * of.pointer_size, of.pointer_size
            )
            pos, zeros_seen = ptr + 1, j << log_s0
        pos, zeros_seen = _scan_zeros(br, of, pos, zeros_seen, h_lb)
        if zeros_seen < h_lb:
            return n, universe  # fewer than h_lb zeros -> all highs < h_lb
    rank = pos - zeros_seen  # ones consumed so far = index of next value
    hb = of.higher_bits_offset
    while rank < n:
        # next one from pos (chunked window scan)
        width = min(256, of.higher_bits_length - pos)
        if width <= 0:
            break
        ones = br.ones_in_window(hb + pos, width)
        for o in ones:
            q = pos + int(o)
            high = q - (rank + 1)
            val = (high << of.lower_bits) | _ef_low(br, of, rank)
            if high > h_lb or val >= lb:
                return rank, val
            rank += 1
            if rank == n:
                return n, universe
        pos += width
    return n, universe


def ef_select(br: BitReader, base: int, universe: int, n: int, i: int,
              log_s0=EF_LOG_SAMPLING0, log_s1=EF_LOG_SAMPLING1) -> int:
    """Value of the i-th element WITHOUT decoding the sequence: jump
    via the sampled 1-pointers (move(i) of the reference enumerator),
    then scan at most 2^log_s1 ones."""
    of = ef_offsets(base, universe, n, log_s0, log_s1)
    if not 0 <= i < n:
        raise IndexError(i)
    m = min((i + 1) >> log_s1, of.pointers1)
    if m > 0:
        ptr = int(
            br.read_bits(
                of.pointers1_offset + (m - 1) * of.pointer_size, of.pointer_size
            )
        )
        ones_seen = m << log_s1  # ptr is the position of the ones_seen-th one
        pos = ptr + 1
        if ones_seen - 1 == i:
            high = ptr - (i + 1)
            return (high << of.lower_bits) | _ef_low(br, of, i)
    else:
        ones_seen, pos = 0, 0
    hb = of.higher_bits_offset
    while pos < of.higher_bits_length:
        width = min(256, of.higher_bits_length - pos)
        ones = br.ones_in_window(hb + pos, width)
        for o in ones:
            if ones_seen == i:
                q = pos + int(o)
                high = q - (i + 1)
                return (high << of.lower_bits) | _ef_low(br, of, i)
            ones_seen += 1
        pos += width
    raise ValueError("ef_select: ran out of ones")


# -------------------------------------------------- compact ranked bitvector

def rb_offsets(base: int, universe: int, n: int,
               log_rank1=RB_LOG_RANK1_SAMPLING, log_s1=RB_LOG_SAMPLING1):
    rank1_sample_size = ceil_log2(n + 1)
    pointer_size = ceil_log2(universe)
    rank1_samples = universe >> log_rank1
    pointers1 = n >> log_s1
    r_off = base
    p_off = r_off + rank1_samples * rank1_sample_size
    b_off = p_off + pointers1 * pointer_size
    return r_off, p_off, b_off, b_off + universe


def rb_bitsize(universe: int, n: int, log_rank1=RB_LOG_RANK1_SAMPLING, log_s1=RB_LOG_SAMPLING1) -> int:
    return rb_offsets(0, universe, n, log_rank1, log_s1)[3]


def rb_write(bw: BitWriter, values: np.ndarray, universe: int, n: int,
             log_rank1=RB_LOG_RANK1_SAMPLING, log_s1=RB_LOG_SAMPLING1) -> None:
    _, _, b_off, end = rb_offsets(bw.size, universe, n, log_rank1, log_s1)
    bw.zero_extend(end - bw.size)
    bw.set_bits_at(b_off + np.asarray(values, dtype=np.int64))


def rb_decode(br: BitReader, base: int, universe: int, n: int,
              log_rank1=RB_LOG_RANK1_SAMPLING, log_s1=RB_LOG_SAMPLING1) -> np.ndarray:
    _, _, b_off, _ = rb_offsets(base, universe, n, log_rank1, log_s1)
    ones = br.ones_in_window(b_off, universe)
    assert len(ones) == n
    return ones


# ------------------------------------------------------- indexed / strict

EF_TYPE, RB_TYPE, ALL_ONES_TYPE = 0, 1, 2
TYPE_BITS = 1


def all_ones_bitsize(universe: int, n: int) -> int:
    return 0 if universe == n else (1 << 63)


def indexed_bitsize(universe: int, n: int) -> int:
    best = all_ones_bitsize(universe, n)
    best = min(best, ef_bitsize(universe, n) + TYPE_BITS)
    best = min(best, rb_bitsize(universe, n) + TYPE_BITS)
    return best


def indexed_write(bw: BitWriter, values: np.ndarray, universe: int, n: int) -> None:
    best = all_ones_bitsize(universe, n)
    best_type = ALL_ONES_TYPE
    if best:
        ef_c = ef_bitsize(universe, n) + TYPE_BITS
        rb_c = rb_bitsize(universe, n) + TYPE_BITS
        if ef_c < best:
            best, best_type = ef_c, EF_TYPE
        if rb_c < best:
            best, best_type = rb_c, RB_TYPE
        bw.append_bits(best_type, TYPE_BITS)
    if best_type == EF_TYPE:
        ef_write(bw, values, universe, n)
    elif best_type == RB_TYPE:
        rb_write(bw, values, universe, n)


def indexed_decode(br: BitReader, base: int, universe: int, n: int) -> tuple[np.ndarray, int]:
    """-> (values, end_bit_offset)."""
    if all_ones_bitsize(universe, n) == 0:
        return np.arange(n, dtype=np.int64), base
    t = br.read_bits(base, TYPE_BITS)
    base += TYPE_BITS
    if t == EF_TYPE:
        return ef_decode(br, base, universe, n), base + ef_bitsize(universe, n)
    return rb_decode(br, base, universe, n), base + rb_bitsize(universe, n)


def strict_ef_bitsize(universe: int, n: int) -> int:
    return ef_bitsize(universe - n + 1, n, log_s0=63)


def strict_bitsize(universe: int, n: int) -> int:
    best = all_ones_bitsize(universe, n)
    best = min(best, strict_ef_bitsize(universe, n) + TYPE_BITS)
    best = min(best, rb_bitsize(universe, n, log_rank1=63) + TYPE_BITS)
    return best


def strict_write(bw: BitWriter, values: np.ndarray, universe: int, n: int) -> None:
    best = all_ones_bitsize(universe, n)
    best_type = ALL_ONES_TYPE
    if best:
        ef_c = strict_ef_bitsize(universe, n) + TYPE_BITS
        rb_c = rb_bitsize(universe, n, log_rank1=63) + TYPE_BITS
        if ef_c < best:
            best, best_type = ef_c, EF_TYPE
        if rb_c < best:
            best, best_type = rb_c, RB_TYPE
        bw.append_bits(best_type, TYPE_BITS)
    v = np.asarray(values, dtype=np.int64)
    if best_type == EF_TYPE:
        ef_write(bw, v - np.arange(n), universe - n + 1, n, log_s0=63)
    elif best_type == RB_TYPE:
        rb_write(bw, v, universe, n, log_rank1=63)


def strict_decode(br: BitReader, base: int, universe: int, n: int) -> tuple[np.ndarray, int]:
    if all_ones_bitsize(universe, n) == 0:
        return np.arange(n, dtype=np.int64), base
    t = br.read_bits(base, TYPE_BITS)
    base += TYPE_BITS
    if t == EF_TYPE:
        vals = ef_decode(br, base, universe - n + 1, n, log_s0=63)
        return vals + np.arange(n), base + strict_ef_bitsize(universe, n)
    return (
        rb_decode(br, base, universe, n, log_rank1=63),
        base + rb_bitsize(universe, n, log_rank1=63),
    )


# ------------------------------------------------------- positive sequence

def positive_write(bw: BitWriter, values: np.ndarray, universe: int, n: int) -> None:
    """Positive values stored as prefix sums over a strict sequence
    (positive_sequence.hpp:15-30); caller supplies universe = sum + ...
    per the container's convention."""
    csum = np.cumsum(np.asarray(values, dtype=np.int64))
    strict_write(bw, csum, universe, n)


def positive_decode(br: BitReader, base: int, universe: int, n: int) -> tuple[np.ndarray, int]:
    csum, end = strict_decode(br, base, universe, n)
    return np.diff(csum, prepend=0), end


# ------------------------------------------------------ optimal partition

def indexed_cost_fast(u: int, m: int) -> int:
    """Closed-form indexed_sequence cost: equals indexed_bitsize(u, m)
    for m >= 1 (which already includes the TYPE_BITS selector; the
    `+ TYPE_BITS` below re-adds it on top of the raw EF/RB body sizes).
    Pure-int fast path: the DP calls this millions of times and must
    not build dataclasses."""
    if u == m:
        return 0  # all_ones (no type bit, all_ones is implicit)
    # compact EF (ef_offsets closed form, sampling 2^9 / 2^8)
    lb = (u // m).bit_length() - 1 if u > m else 0
    hbl = m + (u >> lb) + 2
    ps = (hbl - 1).bit_length() if hbl > 1 else 0
    efb = ((hbl - m) >> 9) * ps + (m >> 8) * ps + hbl + m * lb
    # compact ranked bitvector
    rss = m.bit_length()  # ceil_log2(m + 1)
    rps = (u - 1).bit_length() if u > 1 else 0
    rbb = (u >> 9) * rss + (m >> 8) * rps + u
    return (efb if efb < rbb else rbb) + TYPE_BITS


def strict_cost_fast(u: int, m: int) -> int:
    """Closed-form strict_sequence cost: equals strict_bitsize(u, m)
    for m >= 1 (TYPE_BITS already included there; re-added here on the
    raw body sizes).  Strict params: 0-pointers disabled,
    strict_sequence.hpp:24-30."""
    if u == m:
        return 0
    su = u - m + 1
    lb = (su // m).bit_length() - 1 if su > m else 0
    hbl = m + (su >> lb) + 2
    ps = (hbl - 1).bit_length() if hbl > 1 else 0
    efb = (m >> 8) * ps + hbl + m * lb  # log_sampling0=63: no 0-pointers
    rss = m.bit_length()
    rps = (u - 1).bit_length() if u > 1 else 0
    rbb = (m >> 8) * rps + u  # log_rank1=63: no rank samples
    return (efb if efb < rbb else rbb) + TYPE_BITS


def optimal_partition(values: np.ndarray, universe: int, cost_fun,
                      eps1: float | None = None, eps2: float | None = None,
                      kind: str | None = None) -> list[int]:
    """The (1+eps)-approximate space-optimal partition DP
    (optimal_partition.hpp:70-125): windows capped at geometrically
    increasing cost bounds; returns partition endpoints (last == n).

    ``kind`` in ("indexed", "strict") selects an INLINED closed-form
    window cost (identical values to cost_fun built from
    indexed/strict_cost_fast + FIX_COST) — the DP evaluates the cost
    millions of times and a python call per evaluation doubles encode
    time.  cost_fun is still used for the single-block and lower-bound
    costs, and for everything when kind is None."""
    # late-bound defaults: the module globals may have been set from
    # QS_EPS1/QS_EPS2 env vars (or by the CLI) after import
    if eps1 is None:
        eps1 = EPS1
    if eps2 is None:
        eps2 = EPS2
    size = len(values)
    single = int(cost_fun(universe, size))
    # costs are integral bit counts; the reference's cost_t is uint64,
    # so the geometric bound ladder truncates after every multiply
    # (optimal_partition.hpp:86) — float bounds would flip the
    # `wcost >= bound` window break when wcost == floor(bound)
    cost_lb = int(cost_fun(1, 1))
    bounds = []
    cb = cost_lb
    while eps1 == 0 or cb < cost_lb / eps1:
        bounds.append(cb)
        if cb >= single:
            break
        cb = int(cb * (1 + eps2))
    # Tight pure-python DP (the hot path of every pef/opt encode):
    # python lists + closed-form int costs, no numpy scalar boxing.
    # Window start at outer step i is always i (the reference advances
    # every window's start once per i, optimal_partition.hpp:96-124).
    nb = len(bounds)
    vv = [int(x) for x in np.asarray(values)]
    min_cost = [single] * (size + 1)
    min_cost[0] = 0
    path = [0] * (size + 1)
    ends = [0] * nb
    for i in range(size):
        # window universe base: predecessor + 1 (v[0] on first window)
        base = vv[i - 1] + 1 if i else vv[0]
        mci = min_cost[i]
        last_end = i + 1
        # window ends are nondecreasing across the bound ladder, so
        # when several bounds are stuck at the same end the cost (and
        # its relaxation) is evaluated once and reused
        last_e = -1
        last_w = 0
        for wi in range(nb):
            e = ends[wi]
            if e < last_end:
                e = last_end
            bound = bounds[wi]
            while True:
                if e == last_e:
                    wcost = last_w
                else:
                    if kind is None:
                        wcost = cost_fun(vv[e - 1] - base + 1, e - i)
                    else:
                        # inlined indexed/strict_cost_fast + FIX_COST
                        u_w = vv[e - 1] - base + 1
                        m_w = e - i
                        if u_w == m_w:
                            wcost = FIX_COST
                        else:
                            if kind == "strict":
                                su = u_w - m_w + 1
                                lb = (su // m_w).bit_length() - 1 if su > m_w else 0
                                hbl = m_w + (su >> lb) + 2
                                ps = (hbl - 1).bit_length()
                                efb = (m_w >> 8) * ps + hbl + m_w * lb
                                rbb = (m_w >> 8) * (u_w - 1).bit_length() + u_w
                            else:
                                lb = (u_w // m_w).bit_length() - 1 if u_w > m_w else 0
                                hbl = m_w + (u_w >> lb) + 2
                                ps = (hbl - 1).bit_length()
                                efb = ((hbl - m_w) >> 9) * ps + (m_w >> 8) * ps + hbl + m_w * lb
                                rbb = (u_w >> 9) * m_w.bit_length() + (m_w >> 8) * (u_w - 1).bit_length() + u_w
                            wcost = (efb if efb < rbb else rbb) + 1 + FIX_COST
                    last_e = e
                    last_w = wcost
                    c = mci + wcost
                    if c < min_cost[e]:
                        min_cost[e] = c
                        path[e] = i
                last_end = e
                if e == size or wcost >= bound:
                    break
                e += 1
            ends[wi] = e
    out = []
    cur = size
    while cur != 0:
        out.append(cur)
        cur = path[cur]
    return out[::-1]


# ---------------------------------------------------- partitioned sequence

_BASES = {
    "indexed": (indexed_bitsize, indexed_write, indexed_decode),
    "strict": (strict_bitsize, strict_write, strict_decode),
}


def partitioned_write(bw: BitWriter, values: np.ndarray, universe: int, n: int,
                      partition: list[int] | None = None,
                      base_seq: str = "indexed") -> None:
    """partitioned_sequence<BaseSequence>::write
    (partitioned_sequence.hpp:21-120); base 'indexed' for docs, 'strict'
    for prefix-summed freqs (index_types.hpp opt family)."""
    assert n > 0
    v = np.asarray(values, dtype=np.int64)
    b_bitsize, b_write, _ = _BASES[base_seq]

    if partition is None:
        fast = indexed_cost_fast if base_seq == "indexed" else strict_cost_fast

        def cost_fun(u, m):
            return fast(u, m) + FIX_COST

        partition = optimal_partition(v, universe, cost_fun, kind=base_seq)
    partitions = len(partition)
    write_gamma_nonzero(bw, partitions)

    if partitions == 1:
        base = int(v[0])
        rel = v - base
        ub = int(rel[-1])
        bw.append_bits(base, ceil_log2(universe))
        if n > 1:
            if base + ub + 1 == universe:
                write_delta(bw, 0)  # tight universe
            else:
                write_delta(bw, ub)
        b_write(bw, rel, ub + 1, n)
        return

    seq_bw = BitWriter()
    endpoints = []
    upper_bounds = [int(v[0])]
    cur_base = int(v[0])
    cur_i = 0
    for p_end in partition:
        part = v[cur_i:p_end]
        cur_i = p_end
        rel = part - cur_base
        ub = int(part[-1])
        b_write(seq_bw, rel, int(rel[-1]) + 1, len(rel))
        endpoints.append(seq_bw.size)
        upper_bounds.append(ub)
        cur_base = ub + 1

    endpoint_bits = ceil_log2(seq_bw.size + 1)
    write_gamma(bw, endpoint_bits)
    sizes_bw = BitWriter()
    ef_write(sizes_bw, np.array(partition[:-1], dtype=np.int64), n, partitions - 1)
    ub_bw = BitWriter()
    ef_write(ub_bw, np.array(upper_bounds, dtype=np.int64), universe, partitions + 1)
    bw.append_writer(sizes_bw)
    bw.append_writer(ub_bw)
    for e in endpoints[:-1]:
        bw.append_bits(e, endpoint_bits)
    bw.append_writer(seq_bw)


def partitioned_decode(br: BitReader, base: int, universe: int, n: int,
                       base_seq: str = "indexed") -> tuple[np.ndarray, int]:
    b_bitsize, _, b_decode = _BASES[base_seq]
    br.pos = base
    partitions = read_gamma_nonzero(br)
    if partitions == 1:
        b = br.take(ceil_log2(universe))
        if n > 1:
            ub = read_delta(br)
            if ub == 0:
                ub = universe - b - 1
        else:
            ub = 0
        vals, end = b_decode(br, br.pos, ub + 1, n)
        return vals + b, end
    endpoint_bits = read_gamma(br)
    cur = br.pos
    sizes = ef_decode(br, cur, n, partitions - 1)
    cur += ef_bitsize(n, partitions - 1)
    ubs = ef_decode(br, cur, universe, partitions + 1)
    cur += ef_bitsize(universe, partitions + 1)
    ep_offs = cur + np.arange(partitions - 1, dtype=np.int64) * endpoint_bits
    endpoints = br.read_fields_vec(ep_offs, endpoint_bits).astype(np.int64)
    cur += (partitions - 1) * endpoint_bits
    seq_base = cur
    bounds = np.concatenate([[0], endpoints])
    part_ends = np.concatenate([sizes, [n]]).astype(np.int64)
    out = np.empty(n, dtype=np.int64)
    prev_end = 0
    last_start = 0
    last_u = 1
    last_m = 1
    for p in range(partitions):
        cur_base = int(ubs[0]) if p == 0 else int(ubs[p]) + 1
        ub = int(ubs[p + 1])
        m = int(part_ends[p]) - prev_end
        vals, _ = b_decode(br, seq_base + int(bounds[p]), ub - cur_base + 1, m)
        out[prev_end : prev_end + m] = vals + cur_base
        prev_end += m
        last_start, last_u, last_m = int(bounds[p]), ub - cur_base + 1, m
    end = seq_base + last_start + b_bitsize(last_u, last_m)
    return out, end


def partitioned_bits(values: np.ndarray, universe: int) -> int:
    """Exact encoded size (for stats/DP verification)."""
    bw = BitWriter()
    partitioned_write(bw, values, universe, len(values))
    return bw.size


def uniform_partition(n: int) -> list[int]:
    """Fixed 2^log_partition_size chunks
    (uniform_partitioned_sequence.hpp, log_partition_size=7)."""
    step = 1 << LOG_PARTITION_SIZE
    ends = list(range(step, n, step)) + [n]
    return ends
