"""Storage-direct serving (index/serve.py): distribute queries, read
term chunks straight from the index store per task — the no-shuffle
batch read path.  Must be rank-identical to the gather path
(run_ranked) for every mode, on every index shape:

* fresh index, every ranked mode (same kernels, same rounding);
* LSM-delta-updated index with tombstones: per-segment model/universe
  routing, authoritative term-level df, stale-bound inflation and the
  deletion mask all ride the direct path too;
* EF-family index (no intra-list blocks): block modes fall back to
  taat exactly like run_ranked;
* giant queries exceed the docpart budget and route through the
  doc-partitioned dispatch — per-task fetch stays bounded.
"""

from __future__ import annotations

import pytest

NUM_PARTS = 4
CHUNK = 16
VOCAB = [f"w{i:02d}" for i in range(14)]

QUERIES = [
    (0, ["w00", "w03"]),
    (1, ["w01", "w05", "w07"]),
    (2, ["w02"]),
    (3, ["w04", "w09", "w11", "w13"]),
    (4, ["w00", "w00", "w06"]),        # duplicate term -> qtf fold
    (5, ["zz_oov", "w08"]),            # OOV term drops out
    (6, ["zz_oov"]),                   # fully OOV -> no rows
]


def _corpus(ids):
    rows = []
    for d in ids:
        terms = []
        for i, t in enumerate(VOCAB):
            reps = (d * (i + 3) + i) % 5
            if (d + i) % 3 == 0:
                reps += 1
            terms += [t] * reps
        if not terms:
            terms = [VOCAB[d % len(VOCAB)]]
        rows.append((d, " ".join(terms)))
    return rows


def _build(spark, out_dir, ids, codec="ans"):
    from partitioned_ef_ans_spark.index.checkpoint import build_index_resumable

    build_index_resumable(
        spark,
        spark.createDataFrame(_corpus(ids), "doc_id long, text string"),
        out_dir, codec=codec, num_parts=NUM_PARTS, chunk_postings=CHUNK,
    )


def _gather(spark, out_dir, mode, k=10):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.index.checkpoint import load_tombstones
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    res = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=k,
        term_stats_df=ts, tombstones=load_tombstones(out_dir),
    )
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in res.collect()
    )


def _direct(spark, out_dir, mode, k=10, qpt=2, budget=None):
    from partitioned_ef_ans_spark.index.serve import run_ranked_direct
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    kw = {} if budget is None else {"docpart_budget_bytes": budget}
    res = run_ranked_direct(
        spark, out_dir, queries_to_df(spark, QUERIES), mode=mode, k=k,
        queries_per_task=qpt, **kw,
    )
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in res.collect()
    )


@pytest.fixture(scope="module")
def fresh_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve") / "idx")
    _build(spark, d, range(30))
    return d


@pytest.fixture(scope="module")
def maintained_idx(spark, tmp_path_factory):
    """Delta-updated + tombstoned index: the serving path must honor
    per-segment models, term-level df, bound scales and the mask."""
    from partitioned_ef_ans_spark.index.checkpoint import (
        delete_docs,
        update_index_delta,
    )

    d = str(tmp_path_factory.mktemp("serve_m") / "idx")
    _build(spark, d, range(30))
    update_index_delta(
        spark, d,
        spark.createDataFrame(
            _corpus(range(40, 49)), "doc_id long, text string"
        ),
    )
    delete_docs(spark, d, [0, 7, 41, 48])
    return d


@pytest.mark.parametrize(
    "mode",
    ["blockmax", "maxscore_blockmax", "taat", "ranked_or", "ranked_and",
     "wand", "wand_bmw", "maxscore"],
)
def test_direct_equals_gather_fresh(spark, fresh_idx, mode):
    assert _direct(spark, fresh_idx, mode) == _gather(spark, fresh_idx, mode)


@pytest.mark.parametrize("mode", ["blockmax", "ranked_or", "ranked_and"])
def test_direct_equals_gather_maintained(spark, maintained_idx, mode):
    got = _direct(spark, maintained_idx, mode)
    assert got == _gather(spark, maintained_idx, mode)
    deleted = {0, 7, 41, 48}
    assert not deleted & {doc for _q, _r, doc, _s in got}


def test_direct_ef_family_falls_back_to_taat(spark, tmp_path):
    d = str(tmp_path / "pef")
    _build(spark, d, range(30), codec="pef")
    assert _direct(spark, d, "blockmax") == _gather(spark, d, "blockmax")


def test_direct_ef_delta_universes(spark, tmp_path):
    """EF-family index with delta segments: the direct path must route
    each segment's payloads to its own pinned docID universe (a sparse
    id jump makes a universe mix-up decode garbage, not a near-miss)."""
    from partitioned_ef_ans_spark.index.checkpoint import update_index_delta

    d = str(tmp_path / "pefd")
    _build(spark, d, range(30), codec="pef")
    update_index_delta(
        spark, d,
        spark.createDataFrame(
            _corpus(range(500, 508)), "doc_id long, text string"
        ),
    )
    for mode in ("taat", "ranked_or"):
        assert _direct(spark, d, mode) == _gather(spark, d, mode)


def test_direct_giant_queries_route_to_docpart(spark, fresh_idx):
    """A 1-byte budget makes every query 'giant': all of them route
    through run_ranked's doc-partitioned dispatch and the answer is
    unchanged."""
    assert _direct(spark, fresh_idx, "blockmax", budget=1) == _gather(
        spark, fresh_idx, "blockmax"
    )


def test_part_pruning_hash_rule(spark, maintained_idx):
    """The serve read scopes base parts by ``crc32(term) % num_parts``
    (checkpoint.py's staging rule) — pin that every term's BASE chunks
    really live only in that part, and that delta-segment parts (>=
    num_parts) are the only other place a term's chunks can be."""
    import json
    import zlib

    import pyarrow.dataset as pads

    man = json.load(open(f"{maintained_idx}/manifest.json"))
    np_ = int(man["num_parts"])
    tbl = pads.dataset(
        f"{maintained_idx}/index.parquet", partitioning="hive"
    ).to_table(columns=["term", "part"]).to_pandas()
    assert (tbl["part"].astype(int) >= np_).any()  # has delta chunks
    base = tbl[tbl["part"].astype(int) < np_]
    for term, g in base.groupby("term"):
        assert set(g["part"].astype(int)) == {zlib.crc32(term.encode()) % np_}


def test_decode_group_survives_cache_overflow(spark, fresh_idx, monkeypatch):
    """Regression: when one group's working set exceeds _CACHE_LIMIT,
    the overflow .clear() used to evict chunks earlier rows of the
    SAME group had already resolved as cache hits -> KeyError.  (First
    hit in production by the storage-direct path, whose per-task term
    unions are large; the gather path is equally exposed.)"""
    import pyarrow.dataset as pads

    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod

    _i, _s, _t, codec, man = b_mod.load_index(spark, fresh_idx)
    tbl = pads.dataset(
        f"{fresh_idx}/index.parquet", partitioning="hive"
    ).to_table().to_pandas()
    assert len(tbl) >= 3
    monkeypatch.setattr(q_mod, "_CACHE_LIMIT", 1)
    q_mod._LIST_CACHE.clear()
    q_mod._WEIGHT_CACHE.clear()
    try:
        # first call populates the (tiny) cache with row 0's chunk
        one = tbl.iloc[[0]]
        q_mod._decode_group(one, codec, man["avg_doc_len"])
        assert len(q_mod._LIST_CACHE) == 1
        # second call: row 0 is a HIT, the rest are misses that trip
        # the overflow clear — must not KeyError and must decode all
        lists, norms = q_mod._decode_group(tbl, codec, man["avg_doc_len"])
        assert set(lists) == set(tbl["term"])
        total = sum(len(d) for d, _f in lists.values())
        assert total == int(tbl["n"].sum())
    finally:
        q_mod._LIST_CACHE.clear()
        q_mod._WEIGHT_CACHE.clear()


def test_direct_plan_has_no_index_scan(spark, fresh_idx):
    """The whole point: the Spark plan for the direct path contains NO
    index.parquet scan and no shuffle of posting payloads — only the
    tiny query-batch exchange feeding mapInPandas."""
    from partitioned_ef_ans_spark.index.serve import run_ranked_direct
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    res = run_ranked_direct(
        spark, fresh_idx, queries_to_df(spark, QUERIES), mode="blockmax",
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "index.parquet" not in plan
    assert "payload" not in plan


def test_direct_auto_mode_crossover(spark, fresh_idx, monkeypatch):
    """mode='auto' resolves via the dir-cached payload scalar on the
    storage-direct path too, identical results on both sides of the
    crossover (and no per-call Spark agg: the scalar is cached)."""
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.index import serve as s_mod

    want = _direct(spark, fresh_idx, "ranked_or")
    assert _direct(spark, fresh_idx, "auto") == want
    monkeypatch.setattr(q_mod, "PROBE_EXHAUSTIVE_BUDGET_BYTES", 0)
    assert _direct(spark, fresh_idx, "auto") == want
    # the scalar is served from the mtime-keyed dir cache
    assert any(k[0] == fresh_idx for k in s_mod._TOTAL_BYTES_CACHE)
