"""PRF query expansion (operators/prf.py) and field-collapsed top-k
(index/query.py::run_ranked_collapsed) — the two round-4 retrieval
extensions (both beyond-reference; driver-hashed as the ``rm3`` /
``collapse`` modes of the ranked family unions).

Pinned here:

* expansion-term mining is exactly "top-m by integer tf mass over the
  feedback docs, originals excluded, ties by term" (python replay);
* run_ranked_prf == run_ranked on the manually-expanded query set
  (the two-stage plumbing adds nothing beyond expansion);
* expansion is load-bearing (some query's top-k changes) and OOV
  queries pass through empty;
* collapse keeps at most one doc per (query, group), equals a python
  replay over the full docpart scored relation, and differs from the
  plain top-k when a group dominates it.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from test_deletes import N_DOCS, QUERIES, VOCAB, _build, _corpus

K, K_FB, M = 5, 3, 2


@pytest.fixture(scope="module")
def prf_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prfidx") / "idx")
    _build(spark, d, range(N_DOCS))
    return d


def _load(spark, out_dir):
    from partitioned_ef_ans_spark.index import build as b_mod

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    return index_df, ts, codec, man


def _docs_df(spark):
    return spark.createDataFrame(_corpus(range(N_DOCS)), "doc_id long, text string")


def _ranked(spark, out_dir, queries, k, mode="blockmax"):
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, out_dir)
    return q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, queries), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        dtype="float64", term_stats_df=ts,
    )


def _prf(spark, out_dir, queries, mode="blockmax"):
    from partitioned_ef_ans_spark.operators import prf as prf_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, out_dir)
    return prf_mod.run_ranked_prf(
        spark, index_df, queries_to_df(spark, queries), codec,
        man["num_docs"], man["avg_doc_len"], _docs_df(spark),
        k=K, k_fb=K_FB, m=M, mode=mode, dtype="float64",
        term_stats_df=ts,
    )


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def _py_expansion(fb_pairs, queries):
    """Python replay of the expansion rule from the raw corpus."""
    tf = {
        d: Counter(text.split()) for d, text in _corpus(range(N_DOCS))
    }
    orig = {q: set(t) for q, t in queries}
    out = {}
    for qid in {q for q, _ in fb_pairs}:
        wt = Counter()
        for q, d in fb_pairs:
            if q == qid:
                wt.update(tf[d])
        cand = [
            (-(w), t) for t, w in wt.items() if t not in orig.get(qid, set())
        ]
        out[qid] = [t for _, t in sorted(cand)[:M]]
    return out


def test_expansion_terms_rule(spark):
    """expansion_terms == the documented rule on hand-built frames."""
    from partitioned_ef_ans_spark.operators.prf import expansion_terms

    fb = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, doc_id long"
    )
    fb_tf = spark.createDataFrame(
        [(1, "a", 3), (1, "b", 2), (2, "b", 2), (2, "c", 4), (2, "q", 9)],
        "doc_id long, term string, tf int",
    )
    orig = spark.createDataFrame([(0, "q")], "query_id long, term string")
    got = {
        (r["query_id"], r["term"])
        for r in expansion_terms(fb, fb_tf, orig, m=2).collect()
    }
    # weights: a=3, b=4, c=4, q excluded -> top-2 = b, c (tie 4-4 broken
    # by term asc beats a=3)
    assert got == {(0, "b"), (0, "c")}


def test_prf_equals_manual_expansion(spark, prf_index):
    got = _rows(_prf(spark, prf_index, QUERIES))
    fb = [
        (r["query_id"], r["doc_id"])
        for r in _ranked(spark, prf_index, QUERIES, k=K_FB).collect()
    ]
    exp = _py_expansion(fb, QUERIES)
    expanded = [(q, t + sorted(exp.get(q, []))) for q, t in QUERIES]
    want = _rows(_ranked(spark, prf_index, expanded, k=K))
    assert got == want
    # the expansion is load-bearing: at least one query's top-k moved
    base = _rows(_ranked(spark, prf_index, QUERIES, k=K))
    assert got != base


def test_prf_oov_passthrough(spark, prf_index):
    got = _rows(_prf(spark, prf_index, [(7, ["zzq_oov", "zzq_oov2"])]))
    assert got == []


def test_prf_mode_invariant(spark, prf_index):
    """Both stages ride run_ranked: pruned and exhaustive modes give
    identical PRF results."""
    a = _rows(_prf(spark, prf_index, QUERIES, mode="blockmax"))
    b = _rows(_prf(spark, prf_index, QUERIES, mode="ranked_or"))
    assert a == b


# --------------------------------------------------------------- collapse

def _groups(spark):
    rows = [(d, f"g{d % 3}") for d in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, grp string")


def _collapsed(spark, out_dir, k):
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, out_dir)
    return q_mod.run_ranked_collapsed(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], _groups(spark), k=k,
        term_stats_df=ts,
    )


def test_collapse_replay_and_one_per_group(spark, prf_index):
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, out_dir := prf_index)
    full = q_mod.ranked_scores_docpartitioned(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], term_stats_df=ts,
    ).collect()
    # python replay: best per (query, grp) then top-k
    grp = {d: f"g{d % 3}" for d in range(N_DOCS)}
    by_qg = defaultdict(list)
    for r in full:
        by_qg[(r["query_id"], grp[r["doc_id"]])].append(
            (-r["score"], r["doc_id"])
        )
    best = defaultdict(list)
    for (qid, _g), cands in by_qg.items():
        s, d = min(cands)
        best[qid].append((s, d))
    want = []
    for qid in sorted(best):
        for rank, (s, d) in enumerate(sorted(best[qid])[: 2], start=1):
            want.append((qid, rank, d, -s))
    got = _rows(_collapsed(spark, prf_index, k=2))
    assert got == want
    # ≤ one doc per (query, grp)
    seen = Counter((q, grp[d]) for q, _r, d, _s in got)
    assert all(v == 1 for v in seen.values())


def test_collapse_missing_group_kept_and_tombstones(spark, prf_index):
    """Docs absent from groups_df survive as singleton groups (Lucene
    missing-field collapse), and tombstones= masks through the docpart
    substrate."""
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, prf_index)
    full = _rows(_collapsed(spark, prf_index, k=10))
    # drop half the group rows: those docs must still appear, now as
    # their own groups -> the result can only GAIN rows per query
    partial_groups = _groups(spark).where("doc_id % 2 = 0")
    got = _rows(q_mod.run_ranked_collapsed(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], partial_groups, k=10,
        term_stats_df=ts,
    ))
    docs_full = {(q, d) for q, _r, d, _s in full}
    docs_got = {(q, d) for q, _r, d, _s in got}
    assert docs_full <= docs_got
    odd = [d for _q, _r, d, _s in got if d % 2 == 1]
    assert odd, "no ungrouped doc surfaced — vacuous"
    # tombstones compose: masked docs never serve
    dead = sorted({d for _q, _r, d, _s in got})[:2]
    masked = _rows(q_mod.run_ranked_collapsed(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], _groups(spark), k=10,
        term_stats_df=ts, tombstones=dead,
    ))
    assert masked and not {d for _q, _r, d, _s in masked} & set(dead)


def test_collapse_prune_equals_exhaustive(spark, prf_index):
    """The probe+certificate fast path (prune=True, the default) must
    be BIT-identical to the exhaustive substrate on every shape: tight
    probes that pass the certificate, few-group workloads that force
    the per-query fallback (3 groups < k=10), and partial group maps
    (singleton semantics)."""
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, prf_index)
    qdf = queries_to_df(spark, QUERIES)
    for groups, k, k_probe, max_probe in [
        # tiny probe: certificate does the work
        (_groups(spark), 2, 4, None),
        # 3 groups < k, default (no escalation): failures pay the
        # exhaustive tail directly
        (_groups(spark), 10, 4, None),
        # same failing shape, opt-in ladder: the 10x escalation
        # resolves every query by probe exhaustion instead
        (_groups(spark), 10, 4, 4000),
        # partial map (singleton semantics)
        (_groups(spark).where("doc_id % 2 = 0"), 3, 6, None),
    ]:
        fast = _rows(q_mod.run_ranked_collapsed(
            spark, index_df, qdf, codec, man["num_docs"],
            man["avg_doc_len"], groups, k=k, term_stats_df=ts,
            prune=True, k_probe=k_probe, max_probe=max_probe,
        ))
        slow = _rows(q_mod.run_ranked_collapsed(
            spark, index_df, qdf, codec, man["num_docs"],
            man["avg_doc_len"], groups, k=k, term_stats_df=ts,
            prune=False,
        ))
        assert fast == slow, f"k={k} k_probe={k_probe} cap={max_probe}"


def test_mlt_fuzzy_respect_tombstones(spark, prf_index):
    """The extension operators inherit run_ranked masking: a
    tombstoned doc neither serves nor seeds."""
    from partitioned_ef_ans_spark.operators.mlt import run_more_like_this
    from partitioned_ef_ans_spark.operators.spellcheck import (
        run_ranked_fuzzy,
    )
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, prf_index)
    base = run_more_like_this(
        spark, index_df, spark.createDataFrame([(0,)], "doc_id long"),
        codec, man["num_docs"], man["avg_doc_len"], _docs_df(spark),
        term_stats_df=ts, m=4, k=5, dtype="float64",
    ).collect()
    dead = [base[0]["doc_id"]]
    got = run_more_like_this(
        spark, index_df, spark.createDataFrame([(0,)], "doc_id long"),
        codec, man["num_docs"], man["avg_doc_len"], _docs_df(spark),
        term_stats_df=ts, m=4, k=5, dtype="float64", tombstones=dead,
    ).collect()
    assert got and all(r["doc_id"] != dead[0] for r in got)
    fz = run_ranked_fuzzy(
        spark, index_df,
        queries_to_df(spark, [(0, ["w0q", "w03"])]), codec,
        man["num_docs"], man["avg_doc_len"], term_stats_df=ts,
        k=5, dtype="float64", tombstones=dead,
    ).collect()
    assert fz and all(r["doc_id"] != dead[0] for r in fz)


def test_collapse_is_load_bearing(spark, prf_index):
    """The plain docpart top-k repeats a group inside some query's
    top-3 (3 groups, k=3) — collapse must differ there."""
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, ts, codec, man = _load(spark, prf_index)
    plain = _rows(q_mod.run_ranked_docpartitioned(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], k=3, term_stats_df=ts,
    ))
    grp = {d: f"g{d % 3}" for d in range(N_DOCS)}
    repeats = any(
        v > 1
        for v in Counter((q, grp[d]) for q, _r, d, _s in plain).values()
    )
    assert repeats, "corpus too diverse for the test to bite"
    assert plain != _rows(_collapsed(spark, prf_index, k=3))
