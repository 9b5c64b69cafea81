"""Seeded round-trip suites for the codec plane (SURVEY.md §5 model:
randomized sorted sequences, boundary lengths, degenerate blocks)."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import ans_msb, blocks, vbyte

RNG = np.random.default_rng(42)

# list lengths spanning the vbyte threshold and block-size boundaries
LENGTHS = [1, 2, 9, 10, 11, 16, 127, 128, 129, 255, 256, 257, 300, 1000, 5000]


def random_posting_list(n: int, universe: int, rng) -> tuple[np.ndarray, np.ndarray]:
    docs = np.sort(rng.choice(universe, size=n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 257, size=n).astype(np.int64)
    return docs, freqs


def make_corpus_lists(universe=20000, rng=None):
    rng = rng or np.random.default_rng(42)
    lists = []
    for n in LENGTHS:
        if n > universe:
            continue
        lists.append(random_posting_list(n, universe, rng))
    # all-gaps-1 run (model-0 / sum==0 elision path)
    lists.append((np.arange(500, 500 + 300, dtype=np.int64), rng.integers(1, 5, 300).astype(np.int64)))
    # all-freq-1 list (freq blocks all zeros)
    d, _ = random_posting_list(400, universe, rng)
    lists.append((d, np.ones(400, dtype=np.int64)))
    # clustered gaps (geometric-ish)
    gaps = rng.geometric(0.01, size=2000).astype(np.int64)
    docs = np.cumsum(gaps)
    lists.append((docs, rng.integers(1, 4, size=2000).astype(np.int64)))
    return lists


# ------------------------------------------------------------------- vbyte

def test_vbyte_roundtrip():
    for n in [0, 1, 5, 100, 1000]:
        vals = RNG.integers(0, 2**32 - 1, size=n, dtype=np.uint64).astype(np.uint32)
        buf = np.frombuffer(vbyte.encode(vals), dtype=np.uint8)
        if n == 0:
            assert buf.size == 0
            continue
        out, nxt = vbyte.decode(buf, n)
        assert nxt == buf.size
        np.testing.assert_array_equal(out, vals)


def test_vbyte_boundaries():
    vals = np.array([0, 127, 128, 16383, 16384, 2097151, 2097152, 268435455,
                     268435456, 4294967295], dtype=np.uint32)
    buf = np.frombuffer(vbyte.encode(vals), dtype=np.uint8)
    out, _ = vbyte.decode(buf, len(vals))
    np.testing.assert_array_equal(out, vals)
    # single-byte values have the terminator set immediately
    one = np.frombuffer(vbyte.encode(np.array([5], dtype=np.uint32)), dtype=np.uint8)
    assert one.size == 1 and one[0] == (5 | 0x80)


# ----------------------------------------------------------------- mapping

def test_msb_mapping_roundtrip():
    vals = np.concatenate([
        np.arange(1, 300, dtype=np.uint64),
        RNG.integers(300, 1 << 16, 200, dtype=np.uint64),
        RNG.integers(1 << 16, 1 << 24, 200, dtype=np.uint64),
        RNG.integers(1 << 24, (1 << 32) - 1, 200, dtype=np.uint64),
    ])
    syms = ans_msb.mapping_alistair(vals)
    assert syms.max() <= 1024
    base = ans_msb.undo_mapping(syms)
    eb = ans_msb.exception_bytes(syms)
    mask = (np.uint64(1) << (eb.astype(np.uint64) * np.uint64(8))) - np.uint64(1)
    np.testing.assert_array_equal(base + (vals & mask), vals)


def test_magnitude():
    assert ans_msb.magnitude(np.array([1]))[0] == 0
    assert ans_msb.magnitude(np.array([2]))[0] == 1
    assert ans_msb.magnitude(np.array([3]))[0] == 2
    assert ans_msb.magnitude(np.array([4]))[0] == 2
    assert ans_msb.magnitude(np.array([5]))[0] == 3
    assert ans_msb.magnitude(np.array([1 << 20]))[0] == 20


# ------------------------------------------------------------ normalization

def test_normalize_freqs_power_of_two():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        cnts = np.zeros(ans_msb.MAX_VAL + 1, dtype=np.uint64)
        syms = rng.integers(1, 200, size=50)
        cnts[syms] = rng.integers(1, 100000, size=50)
        uniq = int((cnts != 0).sum())
        target = uniq * ans_msb.FRAME_SIZE_FACTOR
        if target & (target - 1):
            target = 1 << target.bit_length()
        nf = ans_msb.normalize_freqs(cnts, target)
        assert int(nf.sum()) == target
        assert np.all(nf[cnts > 0] >= 1)


# ------------------------------------------------------- ANS whole pipeline

def _train_and_freeze(lists):
    counts_d = ans_msb.new_counts()
    counts_f = ans_msb.new_counts()
    for docs, freqs in lists:
        db, fb, ns, sums, _ = blocks._blockize(docs, freqs, ans_msb.BLOCK_SIZE)
        ans_msb.accumulate_counts(counts_d, db, ns, sums)
        ans_msb.accumulate_counts(
            counts_f, fb, ns, np.full(len(ns), ans_msb.SUM_UNKNOWN)
        )
    enc_d, dec_d = ans_msb.freeze_models(counts_d)
    enc_f, dec_f = ans_msb.freeze_models(counts_f)
    return (enc_d, dec_d), (enc_f, dec_f)


def test_ans_roundtrip_small_universe():
    lists = make_corpus_lists(universe=20000)
    (enc_d, dec_d), (enc_f, dec_f) = _train_and_freeze(lists)

    # docs and freqs streams use separate models; round-trip each list
    for docs, freqs in lists:
        db, fb, ns, sums, _ = blocks._blockize(docs, freqs, ans_msb.BLOCK_SIZE)
        payloads = ans_msb.encode_blocks(db, ns, sums, enc_d)
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        offs = np.cumsum([0] + [len(p) for p in payloads[:-1]])
        vals, sizes = ans_msb.decode_blocks(buf, offs, ns, sums, dec_d)
        np.testing.assert_array_equal(vals, db.astype(np.uint32))
        assert [int(s) for s in sizes] == [len(p) for p in payloads]

        fsums = np.full(len(ns), ans_msb.SUM_UNKNOWN)
        payloads = ans_msb.encode_blocks(fb, ns, fsums, enc_f)
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        offs = np.cumsum([0] + [len(p) for p in payloads[:-1]])
        vals, sizes = ans_msb.decode_blocks(buf, offs, ns, fsums, dec_f)
        np.testing.assert_array_equal(vals, fb.astype(np.uint32))


@pytest.mark.parametrize("avg_gap", [10, 1000, 100000])
def test_ans_roundtrip_large_universe(avg_gap):
    """Mirrors test_ans_block_freq_index.cpp large-gap suites."""
    rng = np.random.default_rng(42 + avg_gap)
    n = 4000
    gaps = rng.geometric(1.0 / avg_gap, size=n).astype(np.int64)
    docs = np.cumsum(gaps)
    freqs = rng.integers(1, 257, size=n).astype(np.int64)
    lists = [(docs, freqs)]
    (enc_d, dec_d), (enc_f, dec_f) = _train_and_freeze(lists)
    codec = blocks.AnsCodec(enc=enc_d, dec=dec_d)
    # whole-layout round trip with docs codec for both streams is wrong;
    # use write/decode path below instead for layout tests.
    db, fb, ns, sums, _ = blocks._blockize(docs, freqs, ans_msb.BLOCK_SIZE)
    payloads = ans_msb.encode_blocks(db, ns, sums, enc_d)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    offs = np.cumsum([0] + [len(p) for p in payloads[:-1]])
    vals, _ = ans_msb.decode_blocks(buf, offs, ns, sums, dec_d)
    np.testing.assert_array_equal(vals, db.astype(np.uint32))


# --------------------------------------------------------------- layout

@pytest.mark.parametrize("codec_name", ["u32", "vbyte"])
def test_block_layout_roundtrip_simple(codec_name):
    lists = make_corpus_lists(universe=20000)
    codec = blocks.CODECS[codec_name]()
    payloads = blocks.write_lists(
        [d for d, _ in lists], [f for _, f in lists], codec
    )
    decoded = blocks.decode_lists(payloads, codec)
    for (docs, freqs), (d2, f2) in zip(lists, decoded):
        np.testing.assert_array_equal(d2, docs)
        np.testing.assert_array_equal(f2, freqs)


class DualAnsCodec:
    """Routes docs blocks to the docs models and freq blocks (identified
    by SUM_UNKNOWN) to the freq models, like the reference's separate
    doc/freq model streams (ans_block_freq_index.hpp:32-47)."""

    block_size = ans_msb.BLOCK_SIZE

    def __init__(self, enc_d, dec_d, enc_f, dec_f):
        self.docs = blocks.AnsCodec(enc=enc_d, dec=dec_d)
        self.freqs = blocks.AnsCodec(enc=enc_f, dec=dec_f)

    def encode_batch(self, blk, ns, sums):
        sums = np.asarray(sums)
        if np.all(sums == blocks.SUM_UNKNOWN):
            return self.freqs.encode_batch(blk, ns, sums)
        return self.docs.encode_batch(blk, ns, sums)

    def decode_batch(self, payload, offsets, ns, sums):
        sums = np.asarray(sums)
        if np.all(sums == blocks.SUM_UNKNOWN):
            return self.freqs.decode_batch(payload, offsets, ns, sums)
        return self.docs.decode_batch(payload, offsets, ns, sums)


def test_block_layout_roundtrip_ans():
    lists = make_corpus_lists(universe=20000)
    (enc_d, dec_d), (enc_f, dec_f) = _train_and_freeze(lists)
    codec = DualAnsCodec(enc_d, dec_d, enc_f, dec_f)
    payloads = blocks.write_lists(
        [d for d, _ in lists], [f for _, f in lists], codec
    )
    decoded = blocks.decode_lists(payloads, codec)
    for (docs, freqs), (d2, f2) in zip(lists, decoded):
        np.testing.assert_array_equal(d2, docs)
        np.testing.assert_array_equal(f2, freqs)
    # compression sanity: ANS beats raw u32 on clustered data
    total_ans = sum(len(p) for p in payloads)
    u32_payloads = blocks.write_lists(
        [d for d, _ in lists], [f for _, f in lists], blocks.U32Codec()
    )
    assert total_ans < sum(len(p) for p in u32_payloads)
