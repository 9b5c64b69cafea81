"""Filtered retrieval: allowlist (keep-mode) masking across every
query path — the polar twin of the tombstone-deletion plane.

A metadata predicate ("only lang='python' docs may serve") becomes a
``query.KeepList`` through ``make_allowlist``; it rides the exact
masking funnel deletions use (``tomb_keep``), so the same guarantees
transfer: frozen corpus stats keep allowed docs' scores BIT-STABLE,
tau derivation sees only allowed docs, and pre-filter maxima stay
admissible (upper bounds over a superset of the allowed set).

The load-bearing equivalence pinned here: ``allowlist=A`` must equal
``tombstones=complement(A)`` tuple-for-tuple in every mode — drop-mode
masking is already driver-certified against the DuckDB oracle
(ranked_deleted_top10, tests/test_deletes.py), so keep-mode inherits
that certification through this equivalence (and has its own hashed
gate entry, ranked_filtered_top10).
"""

from __future__ import annotations

import pytest

from test_deletes import N_DOCS, QUERIES, _build

ALLOW = [d for d in range(N_DOCS) if d % 3 != 1]
COMPLEMENT = [d for d in range(N_DOCS) if d % 3 == 1]

ALL_MODES = (
    "blockmax", "maxscore_blockmax", "wand", "wand_bmw", "maxscore",
    "taat", "ranked_or", "ranked_and",
)


@pytest.fixture(scope="module")
def filt_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("filtidx") / "idx")
    _build(spark, d, range(N_DOCS))
    return d


def _ranked(spark, out_dir, mode, tombstones=None, allowlist=None,
            budget=None, k=10):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        term_stats_df=ts, tombstones=tombstones, allowlist=allowlist,
        docpart_budget_bytes=budget,
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in res.orderBy("query_id", "rank").collect()
    ]


def _boolean(spark, out_dir, conjunctive, tombstones=None, allowlist=None):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, _man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_boolean(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        conjunctive, term_stats_df=ts, tombstones=tombstones,
        allowlist=allowlist,
    )
    return {r["query_id"]: r["matches"] for r in res.collect()}


def test_allowlist_equals_complement_tombstones_every_mode(spark, filt_index):
    for mode in ALL_MODES:
        want = _ranked(spark, filt_index, mode, tombstones=COMPLEMENT)
        got = _ranked(spark, filt_index, mode, allowlist=ALLOW)
        assert got == want, mode
        assert got, mode  # the filter is load-bearing, not vacuous
        assert all(r[2] in set(ALLOW) for r in got), mode


def test_allowlist_composes_with_tombstones(spark, filt_index):
    # a deleted doc never serves even when the filter selects it
    tomb = [d for d in ALLOW[:4]]
    want = _ranked(spark, filt_index, "blockmax",
                   tombstones=sorted(set(COMPLEMENT) | set(tomb)))
    got = _ranked(spark, filt_index, "blockmax",
                  tombstones=tomb, allowlist=ALLOW)
    assert got == want


def test_empty_allowlist_keeps_nothing(spark, filt_index):
    assert _ranked(spark, filt_index, "blockmax", allowlist=[]) == []
    # ...and is distinct from "no filter" (None)
    assert _ranked(spark, filt_index, "blockmax", allowlist=None)


def test_boolean_allowlist_matches_complement(spark, filt_index):
    for conj in (False, True):
        want = _boolean(spark, filt_index, conj, tombstones=COMPLEMENT)
        got = _boolean(spark, filt_index, conj, allowlist=ALLOW)
        assert got == want


def test_docpart_dispatch_masks_allowlist(spark, filt_index):
    # budget=0 forces every query through the doc-partitioned twin
    for mode in ("blockmax", "ranked_and"):
        want = _ranked(spark, filt_index, mode, allowlist=ALLOW)
        got = _ranked(spark, filt_index, mode, allowlist=ALLOW, budget=0)
        assert got == want, mode


def test_direct_serve_allowlist(spark, filt_index):
    from partitioned_ef_ans_spark.index.serve import run_ranked_direct
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    want = _ranked(spark, filt_index, "blockmax", allowlist=ALLOW)
    res = run_ranked_direct(
        spark, filt_index, queries_to_df(spark, QUERIES),
        mode="blockmax", k=10, allowlist=ALLOW,
    )
    got = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in res.orderBy("query_id", "rank").collect()
    ]
    assert got == want
