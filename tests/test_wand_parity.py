"""Reference-oracle pattern (test_ranked_queries.cpp:42-54): WAND and
MaxScore top-10 must be rank-identical to exhaustive ranked-OR under
float32 BM25 — run directly on the kernels, no Spark."""

from __future__ import annotations

import numpy as np
import pytest

from partitioned_ef_ans_spark.functions import bm25
from partitioned_ef_ans_spark.index import query as q

K = 10


def synth_collection(num_docs=2000, vocab=300, seed=42):
    rng = np.random.default_rng(seed)
    doc_lens = np.maximum(1, rng.lognormal(4.0, 1.0, num_docs).astype(np.int64))
    avg = doc_lens.mean()
    norm = (doc_lens / avg).astype(np.float32)
    zipf_p = (np.arange(1, vocab + 1) ** -1.1)
    zipf_p /= zipf_p.sum()
    lists = {}
    for t in range(vocab):
        df = max(1, int(num_docs * zipf_p[t] * rng.uniform(0.5, 8)))
        df = min(df, num_docs)
        docs = np.sort(rng.choice(num_docs, df, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 9, df).astype(np.int64)
        lists[f"t{t:04d}"] = (docs, freqs)
    return lists, norm, num_docs


def rand_queries(lists, n=200, seed=7):
    rng = np.random.default_rng(seed)
    terms = sorted(lists)
    out = []
    for qid in range(n):
        k = int(rng.integers(1, 6))
        # zipf-biased term choice: low ranks more likely
        sel = [terms[min(len(terms) - 1, int(rng.zipf(1.3)) - 1)] for _ in range(k)]
        out.append((qid, sel))
    return out


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_wand_maxscore_rank_identical_to_ranked_or(dtype):
    lists, norm, num_docs = synth_collection()
    queries = rand_queries(lists)
    for qid, terms in queries:
        qlists = {t: lists[t] for t in set(terms)}
        weights = {
            t: q._q_weight(terms.count(t), len(qlists[t][0]), num_docs, dtype)
            for t in qlists
        }
        tws = {
            t: q._doc_weights(qlists[t][1], norm[qlists[t][0]], dtype)
            for t in qlists
        }
        maxw = {
            t: float(
                (
                    bm25.doc_term_weight_vec(
                        qlists[t][1].astype(np.float32),
                        norm[qlists[t][0]].astype(np.float32),
                    )
                ).max()
            )
            for t in qlists
        }
        oracle = q._kernel_ranked_or(qlists, tws, weights, dtype, qid, K)
        wand = q._kernel_wand(
            qlists, tws, weights, maxw, dtype, qid, K, num_docs
        )
        ms = q._kernel_maxscore(
            qlists, tws, weights, maxw, dtype, qid, K, num_docs
        )
        taat = q._kernel_taat_pruned(qlists, tws, weights, maxw, dtype, qid, K)
        for name, got in (("wand", wand), ("maxscore", ms), ("taat", taat)):
            assert got["doc_id"].tolist() == oracle["doc_id"].tolist(), (
                f"q{qid} {name} docids diverge\n{got}\n{oracle}"
            )
            # scores equal within the reference's 0.1% relative tolerance
            np.testing.assert_allclose(
                got["score"].to_numpy(), oracle["score"].to_numpy(), rtol=1e-3
            )


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_wand_bmw_rank_identical_to_ranked_or(dtype):
    """True-BMW faithful walk (shallow block re-bound + boundary
    skipping) vs the exhaustive oracle, over synthetic lists with
    synthetic 64-doc blocks — including docid-tie pivots (the case
    that breaks a naive prefix cut)."""
    from partitioned_ef_ans_spark.index.blockmax import _inflate

    lists, norm, num_docs = synth_collection()
    queries = rand_queries(lists)
    bs = 64
    for qid, terms in queries:
        qlists = {t: lists[t] for t in set(terms)}
        weights = {
            t: q._q_weight(terms.count(t), len(qlists[t][0]), num_docs, dtype)
            for t in qlists
        }
        tws = {
            t: q._doc_weights(qlists[t][1], norm[qlists[t][0]], dtype)
            for t in qlists
        }
        f32w = {
            t: bm25.doc_term_weight_vec(
                qlists[t][1].astype(np.float32),
                norm[qlists[t][0]].astype(np.float32),
            )
            for t in qlists
        }
        maxw = {t: float(f32w[t].max()) for t in qlists}
        if dtype == np.float64:
            maxw = {t: m * (1.0 + 1e-6) + 1e-12 for t, m in maxw.items()}
        bmeta = {}
        for t in qlists:
            docs = qlists[t][0]
            nb = -(-len(docs) // bs)
            ends = np.array(
                [int(docs[min((j + 1) * bs, len(docs)) - 1]) for j in range(nb)],
                dtype=np.int64,
            )
            bw = np.array(
                [float(f32w[t][j * bs:(j + 1) * bs].max()) for j in range(nb)],
                dtype=np.float64,
            )
            bmeta[t] = (ends, _inflate(float(weights[t]) * bw))
        oracle = q._kernel_ranked_or(qlists, tws, weights, dtype, qid, K)
        bmw = q._kernel_wand_bmw(
            qlists, tws, weights, maxw, bmeta, dtype, qid, K, num_docs
        )
        assert bmw["doc_id"].tolist() == oracle["doc_id"].tolist(), (
            f"q{qid} bmw docids diverge\n{bmw}\n{oracle}"
        )
        if dtype == np.float64:
            # f32 accumulation order differs between the walk and the
            # vectorized oracle at the rounding quantum (same accepted
            # property as the faithful wand/maxscore modes); f64
            # accumulation is stable far below ROUND_DECIMALS
            assert bmw["score"].tolist() == oracle["score"].tolist(), (
                f"q{qid} bmw scores diverge"
            )
