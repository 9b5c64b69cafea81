"""Round-trip suites for the simple16 (K7), interpolative (K4),
optpfor (K2) and varint-G8IU (K3) block codecs, mirroring the
reference's test strategy (test_block_codecs.cpp:9-35: random values,
known-sum docs streams, unknown-sum freqs streams, short/partial
blocks)."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import blocks
from partitioned_ef_ans_spark.codecs.interpolative import InterpolativeCodec
from partitioned_ef_ans_spark.codecs.optpfor import OptPForCodec
from partitioned_ef_ans_spark.codecs.simple16 import Simple16Codec
from partitioned_ef_ans_spark.codecs.varintg8iu import VarintG8IUCodec


def _list_cases(rng, num_docs=60000):
    cases = []
    for n in (1, 3, 127, 128, 129, 900):
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 30, size=n).astype(np.int64)
        cases.append((docs, freqs))
    return cases


@pytest.mark.parametrize(
    "codec_cls",
    [Simple16Codec, InterpolativeCodec, OptPForCodec, VarintG8IUCodec],
)
def test_list_roundtrip_through_block_layout(codec_cls):
    rng = np.random.default_rng(21)
    codec = codec_cls()
    cases = _list_cases(rng)
    payloads = blocks.write_lists(
        [d for d, _ in cases], [f for _, f in cases], codec
    )
    out = blocks.decode_lists(payloads, codec)
    for (d, f), (dd, ff) in zip(cases, out):
        assert np.array_equal(d, dd)
        assert np.array_equal(f, ff)


@pytest.mark.parametrize(
    "name", ["simple16", "interpolative", "optpfor", "varintg8iu"]
)
def test_codec_registry(name):
    codec = blocks.CODECS[name]()
    assert codec.block_size == 128


def test_simple16_dense_small_values():
    """28x1-bit case: 128 ones must pack into ~5 words."""
    from partitioned_ef_ans_spark.codecs import simple16

    vals = np.ones(128, dtype=np.uint64)
    enc = simple16.encode(vals)
    assert len(enc) <= 5 * 4
    got, nxt = simple16.decode(enc, 128, 0)
    assert np.array_equal(got, vals)
    assert nxt == len(enc)


def test_simple16_rejects_wide_values():
    from partitioned_ef_ans_spark.codecs import simple16

    with pytest.raises(ValueError):
        simple16.encode(np.array([1 << 28], dtype=np.uint64))


def test_optpfor_exception_path():
    """A few huge outliers among small values must take the exception
    stream (small chosen b), and the payload must beat raw u32."""
    from partitioned_ef_ans_spark.codecs import optpfor

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 8, 128, dtype=np.uint64)
    vals[rng.choice(128, 6, replace=False)] = rng.integers(1 << 24, 1 << 31, 6)
    payload = optpfor.encode_full_block(vals)
    header = int.from_bytes(payload[:4], "little")
    b = header >> 26
    n_exc = (header >> 16) & 0x3FF
    assert b <= 4 and n_exc >= 6
    out, sizes = optpfor.decode_full_blocks(payload, np.array([0]))
    assert np.array_equal(out[0].astype(np.uint64), vals)
    assert sizes[0] == len(payload)
    assert len(payload) < 128 * 4 / 3


def test_optpfor_uniform_no_exceptions():
    """Uniform-width values: b = max bitlen, zero exceptions."""
    from partitioned_ef_ans_spark.codecs import optpfor

    vals = np.arange(100, 228, dtype=np.uint64)  # all 7-8 bit
    payload = optpfor.encode_full_block(vals)
    header = int.from_bytes(payload[:4], "little")
    assert (header >> 16) & 0x3FF == 0  # no exceptions
    out, _ = optpfor.decode_full_blocks(payload, np.array([0]))
    assert np.array_equal(out[0].astype(np.uint64), vals)


def test_varintg8iu_group_shape():
    """The stream is whole 9-byte groups; 1-byte values pack 8 per
    group, 4-byte values pack 2 per group."""
    from partitioned_ef_ans_spark.codecs import varintg8iu

    small = np.arange(128, dtype=np.uint64)  # 1 byte each -> 16 groups
    p = varintg8iu.encode_full_block(small)
    assert len(p) == 16 * 9
    big = np.full(128, (1 << 31) + 5, dtype=np.uint64)  # 4 bytes -> 2/group
    p2 = varintg8iu.encode_full_block(big)
    assert len(p2) == 64 * 9
    for payload, vals in ((p, small), (p2, big)):
        out, sizes = varintg8iu.decode_full_blocks(payload, np.array([0]))
        assert np.array_equal(out[0].astype(np.uint64), vals)
        assert sizes[0] == len(payload)


def test_varintg8iu_incomplete_unit_padding():
    """A value that would straddle the 8-byte boundary starts the next
    group (the IU in G8IU); mixed widths still round-trip."""
    from partitioned_ef_ans_spark.codecs import varintg8iu

    # 7 x 1-byte then a 3-byte value: the 3-byte value cannot fit the
    # 1 remaining data byte, so group 1 holds 7 values + 1 pad byte
    vals = np.concatenate(
        [np.arange(7), [1 << 20], np.arange(120)]
    ).astype(np.uint64)
    p = varintg8iu.encode_full_block(vals)
    desc0 = p[0]
    assert bin(desc0).count("1") == 7  # 7 values end in group 0
    out, _ = varintg8iu.decode_full_blocks(p, np.array([0]))
    assert np.array_equal(out[0].astype(np.uint64), vals)


def test_interpolative_clustered_beats_u32():
    """Clustered doc gaps are interpolative coding's best case — the
    payload must be much smaller than raw u32."""
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(3000, size=900, replace=False)).astype(np.int64)
    freqs = np.ones(900, dtype=np.int64)
    p_int = blocks.write_lists([docs], [freqs], InterpolativeCodec())[0]
    p_u32 = blocks.write_lists([docs], [freqs], blocks.U32Codec())[0]
    assert len(p_int) < len(p_u32) / 3
