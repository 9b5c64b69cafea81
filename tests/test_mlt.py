"""More-like-this (operators/mlt.py) — similar-document retrieval
(driver-hashed as the ``mlt`` mode of ``ranked_indexed_family``).

Pinned: the salient-term rule equals a python replay (tf desc, df asc,
term asc — all integers); self-exclusion is exact and LOAD-BEARING
(the source doc would top its own list); pruned and exhaustive modes
agree."""

from __future__ import annotations

from collections import Counter

import pytest

from test_deletes import N_DOCS, _build, _corpus

M = 4
SRC = [0, 7, 13]


@pytest.fixture(scope="module")
def mlt_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mltidx") / "idx")
    _build(spark, d, range(N_DOCS))
    return d


def _docs_df(spark):
    return spark.createDataFrame(
        _corpus(range(N_DOCS)), "doc_id long, text string"
    )


def _py_salient():
    tfs = {d: Counter(t.split()) for d, t in _corpus(range(N_DOCS))}
    df = Counter()
    for c in tfs.values():
        for t in c:
            df[t] += 1
    out = {}
    for d in SRC:
        ranked = sorted((-tf, df[t], t) for t, tf in tfs[d].items())
        out[d] = sorted(t for _neg, _df, t in ranked[:M])
    return out


def _run(spark, mlt_index, mode="blockmax"):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.mlt import run_more_like_this

    index_df, _s, ts, codec, man = b_mod.load_index(spark, mlt_index)
    ids = spark.createDataFrame([(i,) for i in SRC], "doc_id long")
    return run_more_like_this(
        spark, index_df, ids, codec, man["num_docs"],
        man["avg_doc_len"], _docs_df(spark), term_stats_df=ts,
        m=M, k=5, mode=mode, dtype="float64",
    )


def test_salient_terms_python_replay(spark, mlt_index):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.mlt import mlt_queries

    _ix, _s, ts, _c, _m = b_mod.load_index(spark, mlt_index)
    ids = spark.createDataFrame([(i,) for i in SRC], "doc_id long")
    got = {
        r["query_id"]: list(r["terms"])
        for r in mlt_queries(ids, _docs_df(spark), ts, m=M).collect()
    }
    assert got == _py_salient()


def test_self_excluded_and_load_bearing(spark, mlt_index):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    rows = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in _run(spark, mlt_index).orderBy("query_id", "rank").collect()
    ]
    assert rows and all(q != d for q, _r, d, _s in rows)
    # replay: the raw ranked run on the salient queries must place the
    # source doc in its own top-5 (exclusion is load-bearing), and
    # dropping it + re-ranking must equal run_more_like_this
    index_df, _s, ts, codec, man = b_mod.load_index(spark, mlt_index)
    sal = sorted(_py_salient().items())
    raw = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, sal), codec,
        man["num_docs"], man["avg_doc_len"], mode="ranked_or", k=6,
        dtype="float64", term_stats_df=ts,
    ).orderBy("query_id", "rank").collect()
    self_hit = {q for q, terms in sal} & {
        r["query_id"] for r in raw if r["doc_id"] == r["query_id"]
    }
    assert self_hit, "no source doc ranked in its own list — vacuous"
    want = []
    for qid, _terms in sal:
        kept = [r for r in raw
                if r["query_id"] == qid and r["doc_id"] != qid][:5]
        want += [(qid, i + 1, r["doc_id"], r["score"])
                 for i, r in enumerate(kept)]
    assert rows == want


def test_mode_invariant(spark, mlt_index):
    a = [(r["query_id"], r["rank"], r["doc_id"], r["score"])
         for r in _run(spark, mlt_index, "blockmax")
         .orderBy("query_id", "rank").collect()]
    b = [(r["query_id"], r["rank"], r["doc_id"], r["score"])
         for r in _run(spark, mlt_index, "ranked_or")
         .orderBy("query_id", "rank").collect()]
    assert a == b
