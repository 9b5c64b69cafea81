"""Seeded interaction fuzz across the whole maintenance surface.

Every maintenance operation has its own pinned test (deletes, delta
updates, minor/major compaction, shard merge); this schedule exercises
their CROSS-plane interactions on one live index — deletions landing
inside delta segments that are then minor-folded, per-segment models
surviving folds, pruning bounds staying admissible across arbitrary
interleavings, tombstones riding a major fold, and (for the EF family)
per-segment universes surviving the whole chain.

The schedule and all corpus contents come from one fixed-seed
`random.Random`, so the test is deterministic yet adversarial in a way
hand-written pairwise tests are not.  Invariants checked after EVERY
step:

 I1  the decoded (term, doc_id, tf) set equals the model computed
     driver-side from the same texts — tombstoned docs stay physically
     present until a MAJOR compaction purges them;
 I2  the pruned kernel agrees rank-for-rank with the exhaustive one
     under the tombstone mask (admissibility under every mutation);
 I3  manifest segment accounting matches the part directories on disk.

At the end the index major-compacts and must decode- and rank-equal a
fresh build over the surviving corpus (mirrors reference
verify_collection, tools/verify_collection.cpp, as the end-state
oracle).
"""

from __future__ import annotations

import json
import os
import random
from collections import Counter

NUM_PARTS = 4
CHUNK = 16
VOCAB = [f"w{i:02d}" for i in range(18)]


def _text(rng: random.Random, lo=6, hi=18) -> str:
    n = rng.randint(lo, hi)
    # skewed draw: low vocab indexes are stopword-ish, tail is rare
    toks = [VOCAB[min(int(rng.expovariate(0.25)), len(VOCAB) - 1)]
            for _ in range(n)]
    return " ".join(toks)


def _mk_docs(spark, model, ids):
    return spark.createDataFrame(
        [(d, " ".join(model[d])) for d in ids], "doc_id long, text string"
    )


def _expected_postings(model, present_ids):
    out = set()
    for d in present_ids:
        for t, tf in Counter(model[d]).items():
            out.add((t, d, tf))
    return out


def _decode_flat_rows(spark, out_dir):
    from partitioned_ef_ans_spark.cli import _decode_flat
    from partitioned_ef_ans_spark.index import build as b_mod

    index_df, _s, _t, codec, _m = b_mod.load_index(spark, out_dir)
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in _decode_flat(spark, index_df, codec).collect()
    }


def _ranked(spark, out_dir, queries, mode, tombstones=None, k=10):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, queries), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        term_stats_df=ts, tombstones=tombstones,
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in res.orderBy("query_id", "rank").collect()
    ]


QUERIES = [
    (0, [VOCAB[0], VOCAB[4]]),          # stopword-ish pair
    (1, [VOCAB[9]]),                    # mid-tail single term
    (2, [VOCAB[1], VOCAB[7], VOCAB[12]]),  # mixed df
]


def _check_invariants(spark, d, model, present, tombs_set):
    """I1 + I2 + I3 after a mutation step."""
    from partitioned_ef_ans_spark.index.checkpoint import load_tombstones

    assert _decode_flat_rows(spark, d) == _expected_postings(model, present)

    tombs = load_tombstones(d)
    got = set() if tombs is None else set(int(x) for x in tombs)
    assert got == tombs_set

    pruned = _ranked(spark, d, QUERIES, "blockmax", tombstones=tombs)
    exact = _ranked(spark, d, QUERIES, "ranked_or", tombstones=tombs)
    assert pruned == exact

    man = json.load(open(f"{d}/manifest.json"))
    base_parts = int(man["num_parts"])
    n_delta_parts = sum(
        1
        for x in os.listdir(f"{d}/index.parquet")
        if x.startswith("part=") and int(x.split("=")[1]) >= base_parts
    )
    assert n_delta_parts == int(man.get("delta_segments", 0))


def _run_schedule(spark, tmp_path, codec, ops, rng):
    """Apply the op schedule to one live index, checking invariants
    after every step; returns (dir, model, present, tombs, next_id)."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_deltas,
        compact_index,
        delete_docs,
        update_index_delta,
    )

    d = str(tmp_path / f"fuzz_{codec}")
    model: dict[int, list[str]] = {
        i: _text(rng).split() for i in range(30)
    }
    present = set(model)   # physically in payloads
    live = set(model)      # not tombstoned
    next_id = 30

    build_index_resumable(
        spark, _mk_docs(spark, model, sorted(model)), d, codec=codec,
        num_parts=NUM_PARTS, chunk_postings=CHUNK,
    )
    _check_invariants(spark, d, model, present, present - live)

    for op in ops:
        if op == "delta":
            batch = list(range(next_id, next_id + rng.randint(4, 8)))
            next_id = batch[-1] + 1
            for b in batch:
                model[b] = _text(rng).split()
            update_index_delta(spark, d, _mk_docs(spark, model, batch))
            present |= set(batch)
            live |= set(batch)
        elif op == "delete":
            victims = rng.sample(sorted(live), min(3, len(live) - 5))
            delete_docs(spark, d, victims)
            live -= set(victims)
        elif op == "minor":
            compact_deltas(spark, d)
        elif op == "major":
            compact_index(spark, d)
            present = set(live)
        else:  # pragma: no cover
            raise AssertionError(op)
        _check_invariants(spark, d, model, present, present - live)

    return d, model, present, live, next_id


def _assert_equals_fresh_build(spark, tmp_path, codec, d, model, live, tag):
    """End-state oracle: after a major fold the index must decode- and
    rank-equal a fresh build over the surviving corpus."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_index,
    )

    compact_index(spark, d)
    fresh = str(tmp_path / f"fresh_{codec}_{tag}")
    build_index_resumable(
        spark, _mk_docs(spark, model, sorted(live)), fresh, codec=codec,
        num_parts=NUM_PARTS, chunk_postings=CHUNK,
    )
    assert _decode_flat_rows(spark, d) == _decode_flat_rows(spark, fresh)
    for mode in ("blockmax", "ranked_or", "taat"):
        assert _ranked(spark, d, QUERIES, mode) == _ranked(
            spark, fresh, QUERIES, mode
        ), mode
    # the round-4 retrieval extensions are maintenance-invariant too:
    # more-like-this and field collapse over the maintained index must
    # equal the fresh build (they ride run_ranked / the docpart scored
    # substrate, so segment routing + universes must line up)
    assert _ext_results(spark, d, model, live) == _ext_results(
        spark, fresh, model, live
    )


def _ext_results(spark, out_dir, model, live):
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.mlt import run_more_like_this
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    docs = _mk_docs(spark, model, sorted(live))
    src = spark.createDataFrame([(sorted(live)[0],)], "doc_id long")
    mlt_rows = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in run_more_like_this(
            spark, index_df, src, codec, man["num_docs"],
            man["avg_doc_len"], docs, term_stats_df=ts, m=4, k=5,
            dtype="float64",
        ).orderBy("query_id", "rank").collect()
    ]
    groups = docs.select(
        "doc_id", F.pmod("doc_id", F.lit(3)).cast("string").alias("grp")
    )
    col_rows = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in q_mod.run_ranked_collapsed(
            spark, index_df, queries_to_df(spark, QUERIES), codec,
            man["num_docs"], man["avg_doc_len"], groups, k=5,
            term_stats_df=ts,
        ).orderBy("query_id", "rank").collect()
    ]
    return mlt_rows, col_rows


def test_interaction_fuzz_ans(spark, tmp_path):
    """Long interleaving on the ANS codec (per-segment models)."""
    rng = random.Random(0xC0FFEE)
    ops = [
        "delta", "delete", "delta", "minor", "delete", "delta",
        "delete", "minor", "delta", "major", "delta", "delete",
    ]
    d, model, _present, live, _nid = _run_schedule(
        spark, tmp_path, "ans", ops, rng
    )
    _assert_equals_fresh_build(spark, tmp_path, "ans", d, model, live, "end")


def test_interaction_fuzz_pef_with_concat_merge(spark, tmp_path):
    """EF-family chain ending in a concat merge: per-segment universes
    must survive deletes + minor folds on BOTH sides, the union
    tombstone mask must ride the merge, and a minor fold + major fold
    of the merged index must normalize to a fresh build."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_deltas,
        delete_docs,
        load_tombstones,
        merge_indexes,
        update_index_delta,
    )

    rng = random.Random(0xBEEF)
    ops_a = ["delta", "delete", "delta", "minor", "delete"]
    a, model, present_a, live_a, _ = _run_schedule(
        spark, tmp_path, "pef", ops_a, rng
    )

    # shard B in a strictly higher id range (concat requires ordered
    # disjoint ranges), with its own delta segment + tombstones
    b = str(tmp_path / "fuzz_pef_b")
    b_base = list(range(1000, 1014))
    for i in b_base:
        model[i] = _text(rng).split()
    build_index_resumable(
        spark, _mk_docs(spark, model, b_base), b, codec="pef",
        num_parts=NUM_PARTS, chunk_postings=CHUNK,
    )
    b_extra = list(range(1014, 1019))
    for i in b_extra:
        model[i] = _text(rng).split()
    update_index_delta(spark, b, _mk_docs(spark, model, b_extra))
    delete_docs(spark, b, [1001, 1016])

    merged = str(tmp_path / "fuzz_pef_merged")
    merge_indexes(spark, merged, [a, b], mode="concat")
    present = present_a | set(b_base) | set(b_extra)
    live = (live_a | set(b_base) | set(b_extra)) - {1001, 1016}
    _check_invariants(spark, merged, model, present, present - live)

    # minor fold on the merged index keeps the mask and the pinned
    # seg-0 universe
    compact_deltas(spark, merged)
    _check_invariants(spark, merged, model, present, present - live)

    # one more delta + delete wave post-merge, then normalize
    new = [2000, 2001, 2002]
    for i in new:
        model[i] = _text(rng).split()
    update_index_delta(spark, merged, _mk_docs(spark, model, new))
    present |= set(new)
    live |= set(new)
    delete_docs(spark, merged, [2001])
    live -= {2001}
    _check_invariants(spark, merged, model, present, present - live)
    assert sorted(int(x) for x in load_tombstones(merged)) == sorted(
        present - live
    )

    _assert_equals_fresh_build(
        spark, tmp_path, "pef", merged, model, live, "merged"
    )
