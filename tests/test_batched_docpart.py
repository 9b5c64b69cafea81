"""Batched docpart parity: the docpart twins ship each referenced
(term, chunk) ONCE per query batch (query.py::batched_query_lists_df),
with the referencing queries riding along as a struct array.  The
regime that shape actually changes — many queries sharing the same
Zipf head terms, so one chunk carries dozens of riders with different
taus/masks — is bigger than the 13 gate queries, so this suite drives
a 48-query seeded batch over the gate vocabulary and checks every
docpart twin against its gather/exhaustive counterpart.

Reference oracle pattern: test_ranked_queries.cpp:42-54 (rank-identical
top-k vs an exhaustive scorer).
"""

from __future__ import annotations

import random

import pytest

from partitioned_ef_ans_spark.index import blockmax as bmx
from partitioned_ef_ans_spark.index import query as q_mod
from partitioned_ef_ans_spark.operators import ranked as r_mod

VOCAB_HEAD = ["the", "a", "table", "spark", "join", "scan", "data"]
VOCAB_MID = ["group", "window", "hash", "merge", "sort", "vector",
             "stream", "filter", "query", "customer", "big", "small",
             "fast", "slow", "value"]


def _batch_queries():
    """48 deterministic queries, every one anchored on a head term so
    chunk rows carry many riders; mixed lengths, in-query duplicates,
    the rare `dup` term, and OOV terms."""
    rng = random.Random(42)
    qs = []
    for qid in range(48):
        terms = [rng.choice(VOCAB_HEAD)]
        for _ in range(rng.randrange(0, 4)):
            terms.append(rng.choice(VOCAB_HEAD + VOCAB_MID))
        if qid % 7 == 0:
            terms.append("dup")
        if qid % 11 == 0:
            terms.append("zzqq_missing")
        if qid % 5 == 0:
            terms.append(terms[0])  # in-query duplicate -> qtf=2
        qs.append((qid, terms))
    return qs


@pytest.fixture(scope="module")
def built(spark, sf_small):
    from partitioned_ef_ans_spark.gate import _get_index

    return _get_index(spark, sf_small)


@pytest.fixture(scope="module")
def qdf(spark):
    return r_mod.queries_to_df(spark, _batch_queries())


def _ranked_gather(spark, built, qdf, mode):
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in q_mod.run_ranked(
            spark, built["index_df"], qdf, built["codec"],
            built["num_docs"], built["avg_len"], mode=mode, k=10,
            dtype="float64", term_stats_df=built["term_stats"],
        ).collect()
    }


def test_batched_ranked_docpart_matches_exhaustive(spark, built, qdf):
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in q_mod.run_ranked_docpartitioned(
            spark, built["index_df"], qdf, built["codec"],
            built["num_docs"], built["avg_len"], k=10,
            term_stats_df=built["term_stats"],
        ).collect()
    }
    assert got == _ranked_gather(spark, built, qdf, "ranked_or")


def test_batched_blockmax_docpart_matches_exhaustive(spark, built, qdf):
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bmx.run_blockmax_docpartitioned(
            spark, built["index_df"], qdf, built["codec"],
            built["num_docs"], built["avg_len"], built["term_stats"], k=10,
        ).collect()
    }
    assert got == _ranked_gather(spark, built, qdf, "ranked_or")


def test_batched_ranked_and_docpart_matches_gather(spark, built, qdf):
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in q_mod.run_ranked_and_docpartitioned(
            spark, built["index_df"], qdf, built["codec"],
            built["num_docs"], built["avg_len"], k=10,
            term_stats_df=built["term_stats"],
        ).collect()
    }
    assert got == _ranked_gather(spark, built, qdf, "ranked_and")


@pytest.mark.parametrize("conjunctive", [False, True])
def test_batched_boolean_docpart_matches_gather(spark, built, qdf, conjunctive):
    got = {
        r["query_id"]: r["matches"]
        for r in q_mod.run_boolean_docpartitioned(
            spark, built["index_df"], qdf, built["codec"], conjunctive,
            term_stats_df=built["term_stats"],
        ).collect()
    }
    want = {
        r["query_id"]: r["matches"]
        for r in q_mod.run_boolean(
            spark, built["index_df"], qdf, built["codec"], conjunctive,
            term_stats_df=built["term_stats"],
        ).collect()
    }
    assert got == want
