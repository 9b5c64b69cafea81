"""Round-trip + size-formula suites for the partitioned Elias-Fano
stack, mirroring the reference's randomized sequence tests
(test_compact_elias_fano.cpp, test_partitioned_sequence.cpp,
test_positive_sequence.cpp shapes)."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import ef


def random_sorted(n, universe, rng, strict=True):
    vals = np.sort(rng.choice(universe, size=n, replace=not strict))
    if not strict:
        vals = np.sort(vals)
    return vals.astype(np.int64)


CASES = [
    (1, 100), (2, 100), (5, 64), (10, 1000), (100, 128),  # dense
    (100, 100000), (1000, 1 << 20), (5000, 1 << 26), (255, 256), (256, 256),
]


def test_bit_writer_reader_roundtrip():
    rng = np.random.default_rng(1)
    bw = ef.BitWriter()
    fields = []
    for _ in range(500):
        width = int(rng.integers(1, 57))
        val = int(rng.integers(0, 1 << width))
        fields.append((bw.size, val, width))
        bw.append_bits(val, width)
    br = ef.BitReader(bw.tobytes())
    for off, val, width in fields:
        assert br.read_bits(off, width) == val
    # vectorized field reads
    offs = np.array([f[0] for f in fields if f[2] == fields[0][2]])


def test_gamma_delta_roundtrip():
    bw = ef.BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 100, 10**6, 2**40]
    for v in vals:
        ef.write_gamma(bw, v)
    for v in vals:
        ef.write_delta(bw, v)
    br = ef.BitReader(bw.tobytes())
    for v in vals:
        assert ef.read_gamma(br) == v
    for v in vals:
        assert ef.read_delta(br) == v


@pytest.mark.parametrize("n,universe", CASES)
def test_compact_ef_roundtrip(n, universe):
    if n > universe:
        pytest.skip("n>universe")
    rng = np.random.default_rng(n * 31 + universe % 97)
    vals = random_sorted(n, universe, rng)
    bw = ef.BitWriter()
    base = bw.size
    ef.ef_write(bw, vals, universe, n)
    assert bw.size - base == ef.ef_bitsize(universe, n)
    br = ef.BitReader(bw.tobytes())
    out = ef.ef_decode(br, base, universe, n)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("n,universe", CASES)
def test_indexed_sequence_roundtrip(n, universe):
    if n > universe:
        pytest.skip("n>universe")
    rng = np.random.default_rng(n * 7 + 3)
    vals = random_sorted(n, universe, rng)
    bw = ef.BitWriter()
    base = bw.size
    ef.indexed_write(bw, vals, universe, n)
    assert bw.size - base == ef.indexed_bitsize(universe, n)
    br = ef.BitReader(bw.tobytes())
    out, end = ef.indexed_decode(br, base, universe, n)
    np.testing.assert_array_equal(out, vals)
    assert end == base + ef.indexed_bitsize(universe, n)


def test_indexed_all_ones():
    vals = np.arange(50)
    bw = ef.BitWriter()
    ef.indexed_write(bw, vals, 50, 50)
    assert bw.size == 0  # implicit run costs zero bits
    br = ef.BitReader(b"\x00")
    out, end = ef.indexed_decode(br, 0, 50, 50)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("n,universe", [(10, 1000), (100, 5000), (500, 100000)])
def test_strict_and_positive_roundtrip(n, universe):
    rng = np.random.default_rng(n)
    vals = random_sorted(n, universe, rng)
    bw = ef.BitWriter()
    ef.strict_write(bw, vals, universe, n)
    br = ef.BitReader(bw.tobytes())
    out, end = ef.strict_decode(br, 0, universe, n)
    np.testing.assert_array_equal(out, vals)
    assert end == ef.strict_bitsize(universe, n)

    # positive sequence: freqs 1..256 (test_positive_sequence.cpp:14-35)
    freqs = rng.integers(1, 257, size=n)
    total = int(freqs.sum())
    bw2 = ef.BitWriter()
    ef.positive_write(bw2, freqs, total + 1, n)
    br2 = ef.BitReader(bw2.tobytes())
    out2, _ = ef.positive_decode(br2, 0, total + 1, n)
    np.testing.assert_array_equal(out2, freqs)


@pytest.mark.parametrize(
    "n,universe,style",
    [
        (1, 100, "rand"), (7, 100, "rand"), (128, 1 << 14, "rand"),
        (1000, 1 << 20, "rand"), (5000, 1 << 24, "rand"),
        (3000, 1 << 22, "clustered"), (300, 300, "dense"),
        (4000, 120000, "clustered"),
    ],
)
def test_partitioned_sequence_roundtrip(n, universe, style):
    rng = np.random.default_rng(n + universe % 101)
    if style == "dense":
        vals = np.arange(n, dtype=np.int64)
    elif style == "clustered":
        # runs of consecutive values separated by big jumps — the case
        # the optimal partition exploits
        vals = []
        cur = 0
        while len(vals) < n:
            run = int(rng.integers(1, 200))
            cur += int(rng.integers(1, universe // (n // 10 + 1)))
            for _ in range(min(run, n - len(vals))):
                vals.append(cur)
                cur += 1
        vals = np.array(vals, dtype=np.int64)
        universe = int(vals[-1]) + 1
    else:
        vals = random_sorted(n, universe, rng)
    bw = ef.BitWriter()
    ef.partitioned_write(bw, vals, universe, n)
    br = ef.BitReader(bw.tobytes())
    out, _ = ef.partitioned_decode(br, 0, universe, n)
    np.testing.assert_array_equal(out, vals)


def test_partitioned_beats_flat_on_clustered():
    rng = np.random.default_rng(9)
    vals = []
    cur = 0
    n = 8000
    while len(vals) < n:
        cur += int(rng.integers(1, 1 << 16))
        for _ in range(min(int(rng.integers(50, 300)), n - len(vals))):
            vals.append(cur)
            cur += 1
    vals = np.array(vals, dtype=np.int64)
    universe = int(vals[-1]) + 1
    pef_bits = ef.partitioned_bits(vals, universe)
    flat_bits = ef.ef_bitsize(universe, n)
    assert pef_bits < flat_bits, (pef_bits, flat_bits)


def test_uniform_partition_roundtrip():
    rng = np.random.default_rng(3)
    vals = random_sorted(1000, 1 << 18, rng)
    bw = ef.BitWriter()
    ef.partitioned_write(bw, vals, 1 << 18, 1000, partition=ef.uniform_partition(1000))
    br = ef.BitReader(bw.tobytes())
    out, _ = ef.partitioned_decode(br, 0, 1 << 18, 1000)
    np.testing.assert_array_equal(out, vals)


def test_ef_select_and_next_geq_pointer_guided():
    """Q12: the sampled skip pointers are real behavior now — select(i)
    and next_geq(lb) without whole-sequence decode, exact against the
    decoded array at sizes that exercise BOTH pointer tables (n > 2^8
    ones, > 2^9 zeros)."""
    rng = np.random.default_rng(5)
    for n, universe in ((1, 10), (300, 2000), (2000, 300000), (5000, 6000)):
        vals = random_sorted(n, universe, rng)
        bw = ef.BitWriter()
        ef.ef_write(bw, vals, universe, n)
        br = ef.BitReader(bw.tobytes())
        np.testing.assert_array_equal(ef.ef_decode(br, 0, universe, n), vals)
        for i in list(range(0, n, max(1, n // 37))) + [n - 1]:
            assert ef.ef_select(br, 0, universe, n, i) == vals[i]
        lbs = list(rng.integers(0, universe + 1, 150)) + [
            0, int(vals[0]), int(vals[-1]), universe,
        ]
        for lb in lbs:
            idx = int(np.searchsorted(vals, lb, side="left"))
            want = (idx, int(vals[idx])) if idx < n else (n, universe)
            assert ef.ef_next_geq(br, 0, universe, n, int(lb)) == want


def test_ef_pointers_are_written():
    """The pointer areas must contain the sampled positions (not the
    zero padding of earlier rounds): check pointers1[m-1] is the
    position of the (m<<log_s1)-th one and pointers0[j-1] the position
    of the (j<<log_s0)-th zero."""
    rng = np.random.default_rng(11)
    n, universe = 3000, 400000
    vals = random_sorted(n, universe, rng)
    bw = ef.BitWriter()
    ef.ef_write(bw, vals, universe, n)
    br = ef.BitReader(bw.tobytes())
    of = ef.ef_offsets(0, universe, n)
    assert of.pointers0 > 0 and of.pointers1 > 0
    bits = np.array(
        [br.read_bits(of.higher_bits_offset + p, 1) for p in range(of.higher_bits_length)]
    )
    one_pos = np.flatnonzero(bits)
    zero_pos = np.flatnonzero(bits == 0)
    for m in range(1, of.pointers1 + 1):
        got = br.read_bits(
            of.pointers1_offset + (m - 1) * of.pointer_size, of.pointer_size
        )
        assert got == one_pos[(m << ef.EF_LOG_SAMPLING1) - 1]
    for j in range(1, of.pointers0 + 1):
        got = br.read_bits(
            of.pointers0_offset + (j - 1) * of.pointer_size, of.pointer_size
        )
        assert got == zero_pos[(j << ef.EF_LOG_SAMPLING0) - 1]
