"""Property-based fuzzing of the codec stack (hypothesis).

The reference's suites are seeded-random; hypothesis adds adversarial
shrinkage on top: arbitrary sorted doc sets / tf values through the
full blockize -> train -> encode -> decode pipeline and the PEF list
codec must round-trip exactly.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from partitioned_ef_ans_spark.codecs import ans_msb, blocks, ef, pef, vbyte


@st.composite
def posting_list(draw, max_n=600, max_universe=100000):
    universe = draw(st.integers(10, max_universe))
    n = draw(st.integers(1, min(max_n, universe)))
    docs = draw(
        st.lists(
            st.integers(0, universe - 1), min_size=n, max_size=n, unique=True
        )
    )
    docs = np.sort(np.array(docs, dtype=np.int64))
    freqs = np.array(
        draw(st.lists(st.integers(1, 300), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    return docs, freqs, universe


@settings(max_examples=30, deadline=None)
@given(posting_list())
def test_fuzz_ans_roundtrip(pl):
    docs, freqs, _ = pl
    DB, FB, NS, SUMS, _, _ = blocks.blockize_many([docs], [freqs], ans_msb.BLOCK_SIZE)
    cd = ans_msb.new_counts()
    cf = ans_msb.new_counts()
    ans_msb.accumulate_counts(cd, DB, NS, SUMS)
    ans_msb.accumulate_counts(cf, FB, NS, np.full(len(NS), -1))
    enc_d, dec_d = ans_msb.freeze_models(cd)
    enc_f, dec_f = ans_msb.freeze_models(cf)

    class Dual:
        block_size = ans_msb.BLOCK_SIZE

        def encode_batch(self, blk, ns, sums):
            if np.all(np.asarray(sums) == blocks.SUM_UNKNOWN):
                return ans_msb.encode_blocks(blk, ns, sums, enc_f)
            return ans_msb.encode_blocks(blk, ns, sums, enc_d)

        def decode_batch(self, payload, offsets, ns, sums):
            if np.all(np.asarray(sums) == blocks.SUM_UNKNOWN):
                return ans_msb.decode_blocks(payload, offsets, ns, sums, dec_f)
            return ans_msb.decode_blocks(payload, offsets, ns, sums, dec_d)

    payloads = blocks.write_lists([docs], [freqs], Dual())
    (d2, f2), = blocks.decode_lists(payloads, Dual())
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(f2, freqs)


@settings(max_examples=30, deadline=None)
@given(posting_list())
def test_fuzz_pef_roundtrip(pl):
    docs, freqs, universe = pl
    payloads = pef.encode_lists([docs], [freqs], universe)
    (d2, f2), = pef.decode_lists(payloads, universe)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(f2, freqs)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**32 - 1), min_size=0, max_size=200))
def test_fuzz_vbyte(vals):
    arr = np.array(vals, dtype=np.uint32) if vals else np.empty(0, dtype=np.uint32)
    buf = np.frombuffer(vbyte.encode(arr), dtype=np.uint8)
    if len(vals) == 0:
        assert buf.size == 0
        return
    out, nxt = vbyte.decode(buf, len(vals))
    assert nxt == buf.size
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=30, deadline=None)
@given(posting_list(max_n=400, max_universe=1 << 31))
def test_fuzz_optpfor_roundtrip(pl):
    from partitioned_ef_ans_spark.codecs.optpfor import OptPForCodec

    docs, freqs, _ = pl
    payloads = blocks.write_lists([docs], [freqs], OptPForCodec())
    (d2, f2), = blocks.decode_lists(payloads, OptPForCodec())
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(f2, freqs)


@settings(max_examples=30, deadline=None)
@given(posting_list(max_n=400, max_universe=1 << 31))
def test_fuzz_varintg8iu_roundtrip(pl):
    from partitioned_ef_ans_spark.codecs.varintg8iu import VarintG8IUCodec

    docs, freqs, _ = pl
    payloads = blocks.write_lists([docs], [freqs], VarintG8IUCodec())
    (d2, f2), = blocks.decode_lists(payloads, VarintG8IUCodec())
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(f2, freqs)


@settings(max_examples=30, deadline=None)
@given(posting_list(max_n=300, max_universe=1 << 24))
def test_fuzz_partitioned_sequence(pl):
    docs, _, universe = pl
    bw = ef.BitWriter()
    ef.partitioned_write(bw, docs, universe, len(docs))
    br = ef.BitReader(bw.tobytes())
    out, _ = ef.partitioned_decode(br, 0, universe, len(docs))
    np.testing.assert_array_equal(out, docs)
