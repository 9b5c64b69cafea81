"""Faceted search (query.facet_counts): per-query match counts grouped
by a document metadata attribute, over the doc-partitioned boolean
match relation — gather-free at any query breadth.

The oracle here is computed in pure Python from the corpus generator's
closed form (term presence in test_deletes._corpus is deterministic in
(doc_id, term index)), fully independent of Spark and of the index.
"""

from __future__ import annotations

from collections import Counter

import pytest

from test_deletes import N_DOCS, QUERIES, VOCAB, _build, _corpus


def _facet(doc_id: int) -> str:
    return f"l{doc_id % 3}"


def _doc_terms(doc_id: int) -> set[str]:
    terms = set()
    for i, t in enumerate(VOCAB):
        reps = (doc_id * (i + 3) + i) % 5
        if (doc_id + i) % 3 == 0:
            reps += 1
        if reps:
            terms.add(t)
    if not terms:
        terms.add(VOCAB[doc_id % len(VOCAB)])
    return terms


def _expected(conjunctive: bool, allowed=None):
    out = Counter()
    for qid, qterms in QUERIES:
        need = set(qterms)
        for d in range(N_DOCS):
            if allowed is not None and d not in allowed:
                continue
            have = _doc_terms(d)
            hit = need <= have if conjunctive else bool(need & have)
            if hit:
                out[(qid, _facet(d))] += 1
    return dict(out)


@pytest.fixture(scope="module")
def facet_setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facetidx") / "idx")
    _build(spark, d, range(N_DOCS))
    meta = spark.createDataFrame(
        [(r[0], _facet(r[0])) for r in _corpus(range(N_DOCS))],
        "doc_id long, lang string",
    )
    return d, meta


def _run(spark, idx, meta, conjunctive, **kw):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, _man = b_mod.load_index(spark, idx)
    res = q_mod.facet_counts(
        spark, index_df, queries_to_df(spark, QUERIES), codec, meta,
        "lang", conjunctive=conjunctive, term_stats_df=ts, **kw,
    )
    return {(r["query_id"], r["facet"]): r["matches"] for r in res.collect()}


def test_facet_counts_or_and_match_python_oracle(spark, facet_setup):
    idx, meta = facet_setup
    for conj in (False, True):
        got = _run(spark, idx, meta, conj)
        assert got == _expected(conj), f"conjunctive={conj}"
        assert got  # non-vacuous


def test_facet_counts_respects_allowlist_and_tombstones(spark, facet_setup):
    idx, meta = facet_setup
    allow = [d for d in range(N_DOCS) if d % 2 == 0]
    tomb = [0, 6]
    got = _run(spark, idx, meta, False, allowlist=allow, tombstones=tomb)
    want = _expected(False, allowed=set(allow) - set(tomb))
    assert got == want


def test_facet_counts_top_n(spark, facet_setup):
    idx, meta = facet_setup
    full = _run(spark, idx, meta, False)
    top1 = _run(spark, idx, meta, False, top_n=1)
    for qid in {q for q, _ in full}:
        buckets = {f: m for (q, f), m in full.items() if q == qid}
        # top-1 = largest count, ties by facet value ascending
        want_f = sorted(buckets, key=lambda f: (-buckets[f], f))[0]
        assert {f: m for (q, f), m in top1.items() if q == qid} == {
            want_f: buckets[want_f]
        }
