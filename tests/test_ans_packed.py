"""ans_packed family (A10): normalization invariants + lossless
round-trips through the block layout, mirroring the ans_msb suites."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import ans_packed as ap
from partitioned_ef_ans_spark.codecs import blocks


def _collection(rng, num_docs=50000, n_lists=40):
    doc_lists, freq_lists = [], []
    for _ in range(n_lists):
        n = int(rng.integers(1, 2000))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = (rng.zipf(1.6, size=n).clip(1, 1 << 20)).astype(np.int64)
        doc_lists.append(docs)
        freq_lists.append(freqs)
    doc_lists.append(np.arange(700, dtype=np.int64))  # dense: zero gaps
    freq_lists.append(np.ones(700, dtype=np.int64))
    doc_lists.append(np.array([0, 1 << 25, (1 << 25) + 1], dtype=np.int64))
    freq_lists.append(np.array([1, 1 << 30, 2], dtype=np.int64))
    return doc_lists, freq_lists


def _trained(doc_lists, freq_lists):
    DB, FB, NS, SUMS, _, _ = blocks.blockize_many(
        doc_lists, freq_lists, ap.BLOCK_SIZE
    )
    cd, mvd = ap.new_counts()
    cf, mvf = ap.new_counts()
    ap.accumulate_counts(cd, mvd, DB, NS, SUMS)
    ap.accumulate_counts(cf, mvf, FB, NS, np.full(len(NS), ap.SUM_UNKNOWN))
    return ap.freeze_models(cd, mvd), ap.freeze_models(cf, mvf)


def test_normalize_counts_power_of_two():
    rng = np.random.default_rng(2)
    for _ in range(50):
        cnts = np.zeros(ap.MAX_MAG + 1, dtype=np.uint64)
        mags = rng.integers(0, 22, size=8)
        for m in mags:
            cnts[m] += int(rng.integers(1, 100000))
        mv = int(1 << int(mags.max())) + int(rng.integers(0, 5))
        nf = ap.normalize_counts(cnts, mv)
        total = sum(
            int(nf[m]) * ap.uniq_vals_in_mag(m, mv)
            for m in range(ap.MAX_MAG + 1)
            if nf[m]
        )
        assert total & (total - 1) == 0
        # no trained magnitude loses its slot
        for m in range(ap.MAX_MAG + 1):
            if cnts[m]:
                assert nf[m] >= 1


def test_roundtrip_through_block_layout():
    rng = np.random.default_rng(23)
    doc_lists, freq_lists = _collection(rng)
    (enc_d, dec_d), (enc_f, dec_f) = _trained(doc_lists, freq_lists)
    codec_d = blocks.AnsPackedCodec(enc=enc_d, dec=dec_d)
    codec_f = blocks.AnsPackedCodec(enc=enc_f, dec=dec_f)

    class Dual:
        block_size = ap.BLOCK_SIZE

        def encode_batch(self, blk, ns, sums):
            if np.all(np.asarray(sums) == blocks.SUM_UNKNOWN):
                return codec_f.encode_batch(blk, ns, sums)
            return codec_d.encode_batch(blk, ns, sums)

        def decode_batch(self, payload, offsets, ns, sums):
            if np.all(np.asarray(sums) == blocks.SUM_UNKNOWN):
                return codec_f.decode_batch(payload, offsets, ns, sums)
            return codec_d.decode_batch(payload, offsets, ns, sums)

    payloads = blocks.write_lists(doc_lists, freq_lists, Dual())
    out = blocks.decode_lists(payloads, Dual())
    for (d, f), (dd, ff) in zip(zip(doc_lists, freq_lists), out):
        assert np.array_equal(d, dd)
        assert np.array_equal(f, ff)


def test_fuzz_roundtrip_many_seeds():
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        doc_lists, freq_lists = _collection(rng, n_lists=12)
        (enc_d, dec_d), (enc_f, dec_f) = _trained(doc_lists, freq_lists)
        DB, FB, NS, SUMS, _, _ = blocks.blockize_many(
            doc_lists, freq_lists, ap.BLOCK_SIZE
        )
        pay = ap.encode_blocks(DB, NS, SUMS, enc_d)
        offs = np.cumsum([0] + [len(p) for p in pay[:-1]])
        big = np.frombuffer(b"".join(pay), dtype=np.uint8)
        vals, sizes = ap.decode_blocks(big, offs, NS, SUMS, dec_d)
        valid = np.arange(ap.BLOCK_SIZE)[None, :] < NS[:, None]
        assert np.array_equal(vals[valid], DB[valid].astype(np.uint32))
        assert np.array_equal(
            sizes, np.array([len(p) for p in pay], dtype=np.int64)
        )
