"""PEF list-codec round trips + tokenizer path equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import pef


@pytest.mark.parametrize("seed", [5, 17])
def test_pef_list_roundtrip(seed):
    rng = np.random.default_rng(seed)
    num_docs = 50000
    lists = []
    for n in [1, 2, 5, 11, 130, 1000, 4000]:
        docs = np.sort(rng.choice(num_docs, n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 200, n).astype(np.int64)
        lists.append((docs, freqs))
    # dense run (all-ones partition) + all-freq-1
    lists.append((np.arange(700, 1400, dtype=np.int64), np.ones(700, dtype=np.int64)))
    payloads = pef.encode_lists(
        [d for d, _ in lists], [f for _, f in lists], num_docs
    )
    out = pef.decode_lists(payloads, num_docs)
    for (d, f), (d2, f2) in zip(lists, out):
        np.testing.assert_array_equal(d, d2)
        np.testing.assert_array_equal(f, f2)


def test_pef_compresses_clustered_docs():
    rng = np.random.default_rng(3)
    num_docs = 1 << 22
    vals, cur = [], 0
    while len(vals) < 6000:
        cur += int(rng.integers(1, 1 << 13))
        for _ in range(min(int(rng.integers(50, 200)), 6000 - len(vals))):
            vals.append(cur)
            cur += 1
    docs = np.array(vals, dtype=np.int64)
    freqs = np.ones(len(docs), dtype=np.int64)
    payloads = pef.encode_lists([docs], [freqs], num_docs)
    bits_per_doc = len(payloads[0]) * 8 / len(docs)
    assert bits_per_doc < 8, bits_per_doc  # clustered -> far below log2(U/n)


def test_tokenizer_paths_equivalent(spark, sf_small):
    from partitioned_ef_ans_spark.tokenizer import tokenize, tokenize_arrow

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(100)
    a = sorted(
        map(tuple, tokenize(docs, text_col="text").collect())
    )
    b = sorted(
        map(tuple, tokenize_arrow(docs, text_col="text").collect())
    )
    assert a == b and len(a) > 0
