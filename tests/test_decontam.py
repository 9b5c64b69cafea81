"""Benchmark decontamination (operators/decontam.py): closed-form
overlap oracle, distinct-shingle semantics, threshold cut on rounded
values, and the broadcast scale shape."""

from __future__ import annotations

import re

DOCS = [
    (0, "a b c d e f"),            # eval item 0
    (1, "a b c d e f"),            # exact copy -> frac 1.0
    (2, "x a b c y z q"),          # one of item 0's shingles (a b c)
    (3, "a b c a b c a b c"),      # repeated shingle counts ONCE
    (4, "zz qq ww"),               # clean
    (5, "g h"),                    # eval item too short for n=3
    (6, "d e f a b c"),            # 2 of item 0's 4 shingles (order broken)
]

EVAL = [(100, "a b c d e f"), (101, "g h")]
N = 3


def _sh(text):
    t = [x for x in re.split(r"[^a-z0-9_]+", text.lower()) if x]
    return {" ".join(t[i:i + N]) for i in range(len(t) - N + 1)}


def _want(min_overlap=0.0):
    out = {}
    for eid, etext in EVAL:
        es = _sh(etext)
        if not es:
            continue
        for did, dtext in DOCS:
            hit = len(_sh(dtext) & es)
            frac = round(hit / len(es), 6)
            if hit and frac >= min_overlap:
                out[(did, eid)] = (hit, len(es), frac)
    return out


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    return docs, ev


def test_contamination_matches_closed_form(spark):
    from partitioned_ef_ans_spark.operators.decontam import contamination

    docs, ev = _frames(spark)
    got = {
        (r["doc_id"], r["eval_id"]):
            (r["n_hit"], r["eval_ngrams"], r["overlap_frac"])
        for r in contamination(docs, ev, n=N).collect()
    }
    want = _want()
    assert got == want
    # the hand-written cases the oracle encodes:
    assert got[(1, 100)][2] == 1.0          # exact copy
    assert got[(3, 100)][0] == 1            # repeated shingle counts once
    assert got[(6, 100)][0] == 2            # partial overlap
    assert (4, 100) not in got              # clean doc absent
    assert all(e != 101 for _, e in got)    # short eval item inert


def test_contamination_threshold_on_rounded_value(spark):
    from partitioned_ef_ans_spark.operators.decontam import contamination

    docs, ev = _frames(spark)
    got = {
        (r["doc_id"], r["eval_id"])
        for r in contamination(docs, ev, n=N, min_overlap=0.5).collect()
    }
    assert got == set(_want(0.5))
    assert (2, 100) not in got  # 1/4 = 0.25 cut by the threshold


def test_contaminated_doc_ids_feeds_masking(spark):
    from partitioned_ef_ans_spark.operators.decontam import (
        contaminated_doc_ids,
    )

    docs, ev = _frames(spark)
    drop = {
        r["doc_id"]
        for r in contaminated_doc_ids(docs, ev, n=N, min_overlap=0.5).collect()
    }
    assert drop == {d for (d, _e), v in _want().items() if v[2] >= 0.5}


def test_contamination_plan_broadcasts_eval_side(spark):
    """Scale shape: the eval n-gram table must reach the corpus via a
    broadcast-hash join — no shuffle of corpus shingles."""
    from partitioned_ef_ans_spark.operators.decontam import contamination

    docs, ev = _frames(spark)
    plan = contamination(docs, ev, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
