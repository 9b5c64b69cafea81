"""Whole-list EF-family codecs: the reference's `ef`, `single` and
`uniform` index types (index_types.hpp:18-28).

  ef      = freq_index<compact_elias_fano,
                       positive_sequence<strict_elias_fano>>
  single  = freq_index<indexed_sequence, positive_sequence<>>
            (positive default base = strict_sequence)
  uniform = freq_index<uniform_partitioned_sequence<indexed_sequence>,
                       positive_sequence<uniform_partitioned_sequence<
                           strict_sequence>>>

Sequence layouts, size formulas and partition rules follow the
reference exactly (compact_elias_fano.hpp, strict_elias_fano.hpp:12-36,
strict_sequence.hpp:24-30 sparams, indexed_sequence.hpp,
uniform_partitioned_sequence.hpp:20-105, positive_sequence.hpp:15-30).
Like codecs/pef.py, the per-list payload prefix is the engine's own
(γ_nonzero(n), γ_nonzero(occ)) — the reference splits docs/freqs into
two mmapped bitvector collections with an (occ, n) prefix on the docs
side (freq_index.hpp:81-91); sequence bit layouts are identical, only
the outer packing differs (documented divergence, SURVEY.md §4).

Note strict_elias_fano under positive_sequence uses the DEFAULT
sampling parameters (global_parameters.hpp:6-13), while the strict
selector inside strict_sequence disables 0-sampling (log_sampling0=63)
— both reproduced here.
"""

from __future__ import annotations

import numpy as np

from partitioned_ef_ans_spark.codecs import ef

FAMILIES = ("ef", "single", "uniform")


# ----------------------------------------------- uniform partitioning

def uniform_write(bw: ef.BitWriter, values: np.ndarray, universe: int, n: int,
                  base_seq: str = "indexed") -> None:
    """uniform_partitioned_sequence<Base>::write
    (uniform_partitioned_sequence.hpp:20-105): fixed 2^7-element
    partitions; same header as partitioned_sequence minus the sizes
    sequence (sizes are implicit)."""
    assert n > 0
    v = np.asarray(values, dtype=np.int64)
    _, b_write, _ = ef._BASES[base_seq]
    step = 1 << ef.LOG_PARTITION_SIZE
    partitions = (n + step - 1) // step
    ef.write_gamma_nonzero(bw, partitions)

    if partitions == 1:
        base = int(v[0])
        rel = v - base
        ub = int(rel[-1])
        bw.append_bits(base, ef.ceil_log2(universe))
        if n > 1:
            if base + ub + 1 == universe:
                ef.write_delta(bw, 0)  # tight universe
            else:
                ef.write_delta(bw, ub)
        b_write(bw, rel, ub + 1, n)
        return

    seq_bw = ef.BitWriter()
    endpoints = []
    upper_bounds = [int(v[0])]
    cur_base = int(v[0])
    for p in range(partitions):
        part = v[p * step : min((p + 1) * step, n)]
        rel = part - cur_base
        b_write(seq_bw, rel, int(rel[-1]) + 1, len(part))
        endpoints.append(seq_bw.size)
        ub = int(part[-1])
        upper_bounds.append(ub)
        cur_base = ub + 1

    endpoint_bits = ef.ceil_log2(seq_bw.size + 1)
    ef.write_gamma(bw, endpoint_bits)
    ub_bw = ef.BitWriter()
    ef.ef_write(ub_bw, np.array(upper_bounds, dtype=np.int64), universe, partitions + 1)
    bw.append_writer(ub_bw)
    for e in endpoints[:-1]:
        bw.append_bits(e, endpoint_bits)
    bw.append_writer(seq_bw)


def uniform_decode(br: ef.BitReader, base: int, universe: int, n: int,
                   base_seq: str = "indexed") -> tuple[np.ndarray, int]:
    b_bitsize, _, b_decode = ef._BASES[base_seq]
    step = 1 << ef.LOG_PARTITION_SIZE
    br.pos = base
    partitions = ef.read_gamma_nonzero(br)
    if partitions == 1:
        b = br.take(ef.ceil_log2(universe))
        if n > 1:
            ub = ef.read_delta(br)
            if ub == 0:
                ub = universe - b - 1
        else:
            ub = 0
        vals, end = b_decode(br, br.pos, ub + 1, n)
        return vals + b, end
    endpoint_bits = ef.read_gamma(br)
    cur = br.pos
    ubs = ef.ef_decode(br, cur, universe, partitions + 1)
    cur += ef.ef_bitsize(universe, partitions + 1)
    ep_offs = cur + np.arange(partitions - 1, dtype=np.int64) * endpoint_bits
    endpoints = br.read_fields_vec(ep_offs, endpoint_bits).astype(np.int64)
    cur += (partitions - 1) * endpoint_bits
    seq_base = cur
    bounds = np.concatenate([[0], endpoints])
    out = np.empty(n, dtype=np.int64)
    last_start = last_u = last_m = 0
    for p in range(partitions):
        cur_base = int(ubs[0]) if p == 0 else int(ubs[p]) + 1
        ub = int(ubs[p + 1])
        lo = p * step
        m = min(step, n - lo)
        vals, _ = b_decode(br, seq_base + int(bounds[p]), ub - cur_base + 1, m)
        out[lo : lo + m] = vals + cur_base
        last_start, last_u, last_m = int(bounds[p]), ub - cur_base + 1, m
    return out, seq_base + last_start + b_bitsize(last_u, last_m)


# --------------------------------------------------- family codecs

def _write_docs(bw, docs, num_docs, n, family):
    if family == "ef":
        ef.ef_write(bw, docs, num_docs, n)
    elif family == "single":
        ef.indexed_write(bw, docs, num_docs, n)
    else:
        uniform_write(bw, docs, num_docs, n, base_seq="indexed")


def _decode_docs(br, base, num_docs, n, family):
    if family == "ef":
        return ef.ef_decode(br, base, num_docs, n), base + ef.ef_bitsize(num_docs, n)
    if family == "single":
        return ef.indexed_decode(br, base, num_docs, n)
    return uniform_decode(br, base, num_docs, n, base_seq="indexed")


def _write_freqs(bw, csum, occ, n, family):
    universe = occ + 1
    if family == "ef":
        # positive_sequence<strict_elias_fano>: v_i - i transform with
        # DEFAULT sampling params (strict_elias_fano.hpp:20-36)
        ef.ef_write(bw, csum - np.arange(n), universe - n + 1, n)
    elif family == "single":
        ef.strict_write(bw, csum, universe, n)
    else:
        uniform_write(bw, csum, universe, n, base_seq="strict")


def _decode_freqs(br, base, occ, n, family):
    universe = occ + 1
    if family == "ef":
        vals = ef.ef_decode(br, base, universe - n + 1, n)
        return vals + np.arange(n), base + ef.ef_bitsize(universe - n + 1, n)
    if family == "single":
        return ef.strict_decode(br, base, universe, n)
    return uniform_decode(br, base, universe, n, base_seq="strict")


def encode_lists(
    doc_lists: list[np.ndarray],
    freq_lists: list[np.ndarray],
    num_docs: int,
    family: str,
) -> list[bytes]:
    assert family in FAMILIES
    out = []
    for docs, freqs in zip(doc_lists, freq_lists):
        n = len(docs)
        occ = int(np.sum(freqs))
        bw = ef.BitWriter()
        ef.write_gamma_nonzero(bw, n)
        ef.write_gamma_nonzero(bw, occ)
        _write_docs(bw, np.asarray(docs, dtype=np.int64), num_docs, n, family)
        csum = np.cumsum(np.asarray(freqs, dtype=np.int64))
        _write_freqs(bw, csum, occ, n, family)
        out.append(bw.tobytes())
    return out


def decode_lists(payloads, num_docs: int, family: str):
    assert family in FAMILIES
    out = []
    for p in payloads:
        br = ef.BitReader(p)
        n = ef.read_gamma_nonzero(br)
        occ = ef.read_gamma_nonzero(br)
        docs, end = _decode_docs(br, br.pos, num_docs, n, family)
        csum, _ = _decode_freqs(br, end, occ, n, family)
        freqs = np.diff(csum, prepend=0)
        out.append((docs, freqs))
    return out
