"""Round-trip suites for the simple16 (K7) and interpolative (K4)
block codecs, mirroring the reference's test strategy
(test_block_codecs.cpp:9-35: random values, known-sum docs streams,
unknown-sum freqs streams, short/partial blocks)."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import blocks
from partitioned_ef_ans_spark.codecs.interpolative import InterpolativeCodec
from partitioned_ef_ans_spark.codecs.simple16 import Simple16Codec


def _list_cases(rng, num_docs=60000):
    cases = []
    for n in (1, 3, 127, 128, 129, 900):
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 30, size=n).astype(np.int64)
        cases.append((docs, freqs))
    return cases


@pytest.mark.parametrize("codec_cls", [Simple16Codec, InterpolativeCodec])
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


@pytest.mark.parametrize("name", ["simple16", "interpolative"])
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


def test_interpolative_clustered_beats_u32():
    """Clustered doc gaps are interpolative coding's best case — the
    payload must be much smaller than raw u32."""
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(3000, size=900, replace=False)).astype(np.int64)
    freqs = np.ones(900, dtype=np.int64)
    p_int = blocks.write_lists([docs], [freqs], InterpolativeCodec())[0]
    p_u32 = blocks.write_lists([docs], [freqs], blocks.U32Codec())[0]
    assert len(p_int) < len(p_u32) / 3
