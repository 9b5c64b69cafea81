"""Round-trip + layout tests for the whole-list EF index families
(`ef`, `single`, `uniform` — index_types.hpp:18-28), mirroring the
reference's test_freq_index / sequence round-trip strategy."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import ef, eflist


def _collections(rng, num_docs=9000):
    cases = []
    for n in (1, 2, 7, 127, 128, 129, 1000, 5000):
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 17, size=n).astype(np.int64)
        cases.append((docs, freqs))
    # dense list: exercises the all_ones / ranked_bitvector arms
    cases.append(
        (np.arange(3000, dtype=np.int64), np.ones(3000, dtype=np.int64))
    )
    # clustered list: exercises uniform partition bases
    base = np.sort(rng.choice(500, size=400, replace=False))
    cases.append(
        (
            np.concatenate([base, base + 8000]).astype(np.int64),
            rng.integers(1, 5, size=800).astype(np.int64),
        )
    )
    return cases


@pytest.mark.parametrize("family", eflist.FAMILIES)
def test_roundtrip(family):
    rng = np.random.default_rng(11)
    num_docs = 9000
    cases = _collections(rng, num_docs)
    doc_lists = [d for d, _ in cases]
    freq_lists = [f for _, f in cases]
    payloads = eflist.encode_lists(doc_lists, freq_lists, num_docs, family)
    out = eflist.decode_lists(payloads, num_docs, family)
    for (d, f), (dd, ff) in zip(cases, out):
        assert np.array_equal(d, dd)
        assert np.array_equal(f, ff)


@pytest.mark.parametrize("base_seq", ["indexed", "strict"])
def test_uniform_partition_roundtrip_direct(base_seq):
    rng = np.random.default_rng(5)
    universe = 40000
    for n in (1, 127, 128, 129, 300, 2000):
        v = np.sort(rng.choice(universe - 1, size=n, replace=False)).astype(np.int64)
        if base_seq == "strict":
            v = np.sort(rng.choice(universe - 1, size=n, replace=False))
            v = np.unique(v).astype(np.int64)
        bw = ef.BitWriter()
        eflist.uniform_write(bw, v, universe, len(v), base_seq=base_seq)
        br = ef.BitReader(bw.tobytes())
        got, end = eflist.uniform_decode(br, 0, universe, len(v), base_seq=base_seq)
        assert np.array_equal(got, v)
        assert end <= bw.size
        assert bw.size - end < 64  # end formula accounts for every partition


def test_ef_freqs_use_default_sampling_params():
    """strict_elias_fano under positive_sequence keeps the DEFAULT
    ef_log_sampling0 (9), unlike strict_sequence's sparams (63): the
    encoded size must include the pointers0 area."""
    n = 4000
    freqs = np.full(n, 3, dtype=np.int64)
    csum = np.cumsum(freqs)
    occ = int(csum[-1])
    u = occ + 1 - n + 1
    expected = ef.ef_bitsize(u, n)  # default params
    bw = ef.BitWriter()
    ef.ef_write(bw, csum - np.arange(n), u, n)
    assert bw.size == expected
    assert expected != ef.ef_bitsize(u, n, log_s0=63)


def test_pef_partition_counts_match_dp():
    """V4: the payload-prefix partition counter must agree with the DP
    that produced the partitions (long-list stat, create_freq_index
    .cpp:200-220)."""
    from partitioned_ef_ans_spark.codecs import pef

    rng = np.random.default_rng(17)
    num_docs = 200000
    docs = np.sort(rng.choice(num_docs, size=5000, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 9, size=5000).astype(np.int64)
    payloads = pef.encode_lists([docs], [freqs], num_docs)
    (n, parts), = pef.partition_counts(payloads)
    assert n == 5000

    def cost(u, m):
        return ef.indexed_cost_fast(u, m) + ef.FIX_COST

    expected = len(ef.optimal_partition(docs, num_docs, cost, kind="indexed"))
    assert parts == expected
