"""ANS-MSB model-variant round-trips (index_types.hpp:50-53): every
variant must losslessly round-trip realistic posting-list batches
through its own header format and model tables."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import ans_msb, blocks


def _training_collection(rng, num_docs=50000, n_lists=40):
    doc_lists, freq_lists = [], []
    for _ in range(n_lists):
        n = int(rng.integers(1, 2000))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = (rng.zipf(1.6, size=n).clip(1, 1 << 20)).astype(np.int64)
        doc_lists.append(docs)
        freq_lists.append(freqs)
    # adversarial: dense run (zero gaps), huge outlier values
    doc_lists.append(np.arange(700, dtype=np.int64))
    freq_lists.append(np.full(700, 1, dtype=np.int64))
    doc_lists.append(np.array([0, 1 << 25, (1 << 25) + 1], dtype=np.int64))
    freq_lists.append(np.array([1, 1 << 30, 2], dtype=np.int64))
    return doc_lists, freq_lists


@pytest.mark.parametrize("variant", sorted(ans_msb.VARIANTS))
def test_variant_roundtrip(variant):
    rng = np.random.default_rng(13)
    doc_lists, freq_lists = _training_collection(rng)
    DB, FB, NS, SUMS, _, _ = blocks.blockize_many(
        doc_lists, freq_lists, ans_msb.BLOCK_SIZE
    )
    cd = ans_msb.new_counts(variant)
    cf = ans_msb.new_counts(variant)
    ans_msb.accumulate_counts(cd, DB, NS, SUMS, variant)
    ans_msb.accumulate_counts(
        cf, FB, NS, np.full(len(NS), ans_msb.SUM_UNKNOWN), variant
    )
    (enc_d, dec_d), (enc_f, dec_f) = (
        ans_msb.freeze_models(cd, variant),
        ans_msb.freeze_models(cf, variant),
    )
    assert enc_d.header == ans_msb.VARIANTS[variant][1]
    codec = blocks.AnsCodec(enc=enc_d, dec=dec_d)
    codec_f = blocks.AnsCodec(enc=enc_f, dec=dec_f)

    class Dual:
        block_size = ans_msb.BLOCK_SIZE

        def encode_batch(self, blk, ns, sums):
            if np.all(np.asarray(sums) == blocks.SUM_UNKNOWN):
                return codec_f.encode_batch(blk, ns, sums)
            return codec.encode_batch(blk, ns, sums)

        def decode_batch(self, payload, offsets, ns, sums):
            if np.all(np.asarray(sums) == blocks.SUM_UNKNOWN):
                return codec_f.decode_batch(payload, offsets, ns, sums)
            return codec.decode_batch(payload, offsets, ns, sums)

    payloads = blocks.write_lists(doc_lists, freq_lists, Dual())
    out = blocks.decode_lists(payloads, Dual())
    for (d, f), (dd, ff) in zip(zip(doc_lists, freq_lists), out):
        assert np.array_equal(d, dd)
        assert np.array_equal(f, ff)


def test_non_merged_variants_keep_identity_remap():
    rng = np.random.default_rng(3)
    doc_lists, freq_lists = _training_collection(rng, n_lists=10)
    DB, FB, NS, SUMS, _, _ = blocks.blockize_many(
        doc_lists, freq_lists, ans_msb.BLOCK_SIZE
    )
    for variant in ("max_1d", "minmax_2d", "med90p_2d"):
        c = ans_msb.new_counts(variant)
        ans_msb.accumulate_counts(c, DB, NS, SUMS, variant)
        enc, _ = ans_msb.freeze_models(c, variant)
        assert np.array_equal(
            enc.remap, np.arange(ans_msb.VARIANTS[variant][0])
        )


def test_merged_variants_condense_to_63():
    rng = np.random.default_rng(9)
    doc_lists, freq_lists = _training_collection(rng, n_lists=60)
    DB, FB, NS, SUMS, _, _ = blocks.blockize_many(
        doc_lists, freq_lists, ans_msb.BLOCK_SIZE
    )
    for variant in ("med90p_2d_merged", "medmax_2d_merged"):
        c = ans_msb.new_counts(variant)
        ans_msb.accumulate_counts(c, DB, NS, SUMS, variant)
        enc, _ = ans_msb.freeze_models(c, variant)
        assert enc.remap.max() <= ans_msb.MAX_NUM_MODELS
