"""Chunk-lazy faithful DAAT walks (query._LazyEnum): the lazy path
(PEFA_LAZY_FAITHFUL=1, the default) must be row-identical to the eager
whole-list decode on every faithful mode, with and without tombstone
masks, on a multi-chunk index (CHUNK=16 forces many chunks per list).

Also pins the point of the laziness: on a conjunctive-ish walk the
lazy enumerator decodes strictly fewer chunks than the index holds
(metadata skipping is real, not a no-op).
"""

from __future__ import annotations

import numpy as np
import pytest

from test_deletes import N_DOCS, QUERIES, _build

MODES = ["wand", "wand_bmw", "maxscore"]


@pytest.fixture(scope="module")
def lazy_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lazyidx") / "idx")
    _build(spark, d, range(N_DOCS))
    return d


def _load(spark, out_dir):
    from partitioned_ef_ans_spark.index import build as b_mod

    index_df, _s, ts, codec, man = b_mod.load_index(spark, out_dir)
    return index_df, ts, codec, man


def _run(spark, out_dir, mode, dtype, tombstones, monkeypatch, lazy):
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    monkeypatch.setenv("PEFA_LAZY_FAITHFUL", "1" if lazy else "0")
    # force laziness onto this small fixture's 2-chunk lists (the
    # closure captures both knobs driver-side)
    monkeypatch.setattr(q_mod, "LAZY_MIN_CHUNKS", 1)
    index_df, ts, codec, man = _load(spark, out_dir)
    rows = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, QUERIES), codec,
        man["num_docs"], man["avg_doc_len"], mode=mode, k=5,
        dtype=dtype, term_stats_df=ts, tombstones=tombstones,
    ).collect()
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_lazy_equals_eager(spark, lazy_idx, monkeypatch, mode, dtype):
    got = _run(spark, lazy_idx, mode, dtype, None, monkeypatch, lazy=True)
    want = _run(spark, lazy_idx, mode, dtype, None, monkeypatch, lazy=False)
    assert got == want and got


@pytest.mark.parametrize("mode", MODES)
def test_lazy_equals_eager_tombstoned(spark, lazy_idx, monkeypatch, mode):
    dead = list(range(0, N_DOCS, 3))  # heavy mask incl. chunk heads
    got = _run(spark, lazy_idx, mode, "float64", dead, monkeypatch, True)
    want = _run(spark, lazy_idx, mode, "float64", dead, monkeypatch, False)
    assert got == want and got
    assert not {d for _q, _r, d, _s in got} & set(dead)


def test_lazy_enum_skips_chunks():
    """Unit drive of _LazyEnum over synthetic chunk rows: next_geq
    jumps over whole chunks without decoding them."""
    from partitioned_ef_ans_spark.index import query as q_mod

    decoded = []

    class FakeCodec:
        tag = "fake-test"

    rows = []
    per = 8
    for ci in range(10):
        docs = np.arange(ci * 100, ci * 100 + per, dtype=np.int64)
        rows.append(
            (("fake-test", "t", ci, per, int(docs[0]), int(docs[-1])),
             ci, np.ones(per, dtype=np.float64), int(docs[0]),
             int(docs[-1]))
        )

    def fake_decode(codec, payloads, chunk_ids):
        decoded.extend(chunk_ids)
        out = []
        for ci in chunk_ids:  # payloads arrive as opaque bytes
            docs = np.arange(ci * 100, ci * 100 + per, dtype=np.int64)
            out.append((docs, np.ones(per, dtype=np.int64)))
        return out

    import partitioned_ef_ans_spark.index.build as b_mod

    orig = b_mod.decode_lists_segmented
    b_mod.decode_lists_segmented = fake_decode
    try:
        q_mod._LIST_CACHE.clear()
        q_mod._WEIGHT_CACHE.clear()
        lv = q_mod._LazyList(rows, FakeCodec(), 1.0, None, np.float64)
        en = q_mod._LazyEnum(lv, sentinel=10_000, q_weight=1.0,
                             max_weight=1.0)
        assert en.cur == 0 and decoded == []  # virtual at chunk 0
        en.next_geq(505)  # lands mid-chunk 5
        assert en.cur == 505
        assert decoded == [5], "chunks 0-4 must not decode"
        _ = en.w[en.pos]  # already materialized
        en.next()
        assert en.cur == 506
        en.next_geq(903)  # skip chunks 6-8 entirely
        assert en.cur == 903 and decoded == [5, 9]
        en.next_geq(950)  # past the last chunk -> exhausted
        assert en.cur == 10_000
        # fresh enum: touching w at the virtual start forces chunk 0
        en2 = q_mod._LazyEnum(lv, sentinel=10_000, q_weight=1.0,
                              max_weight=1.0)
        assert en2.w[en2.pos] > 0 and 0 in decoded  # BM25 doc weight
    finally:
        b_mod.decode_lists_segmented = orig
        q_mod._LIST_CACHE.clear()
        q_mod._WEIGHT_CACHE.clear()


def test_wand_bmw_fully_masked_short_term(spark, lazy_idx):
    """A term whose ENTIRE (eager, sub-LAZY_MIN_CHUNKS) posting list is
    tombstoned is dropped from lists/weights by _apply_tomb — the BMW
    meta builder must be restricted to the surviving terms or the
    kernel dies with KeyError on the dead term (its chunk rows are
    still in the worker's pdf).  Default lazy threshold on purpose:
    this fixture's ~2-chunk lists take the eager drop path."""
    from test_deletes import _corpus

    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    dead = [d for d, text in _corpus(range(N_DOCS)) if "w00" in text.split()]
    assert 0 < len(dead) < N_DOCS
    index_df, ts, codec, man = _load(spark, lazy_idx)
    q = queries_to_df(spark, [(0, ["w00", "w01"])])
    got = {}
    for mode in ("wand_bmw", "wand"):
        rows = q_mod.run_ranked(
            spark, index_df, q, codec, man["num_docs"], man["avg_doc_len"],
            mode=mode, k=5, dtype="float64", term_stats_df=ts,
            tombstones=dead,
        ).collect()
        got[mode] = sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
        )
    assert got["wand_bmw"] == got["wand"] and got["wand_bmw"]


def test_latency_rejects_unknown_mode(lazy_idx):
    """'auto' (and any unknown name) must not silently time the
    trailing ranked_and branch under a wrong label."""
    from partitioned_ef_ans_spark.latency import kernel_latency_stats

    with pytest.raises(ValueError, match="no mode 'auto'"):
        kernel_latency_stats(lazy_idx, [(0, ["w00"])], modes=("auto",))


def test_latency_faithful_counters_chunk_granularity(lazy_idx, monkeypatch):
    """Faithful modes report chunk-lazy decode work (touched_frac),
    not the old full-decode pretense (scored_frac pinned at 1.0)."""
    monkeypatch.setenv("PEFA_LAZY_FAITHFUL", "1")
    from partitioned_ef_ans_spark.latency import kernel_latency_stats

    qs = [(i, q) for i, (q,) in enumerate(zip([t for _, t in QUERIES]))]
    stats = kernel_latency_stats(lazy_idx, qs, modes=("wand", "taat"))
    w = stats["wand"]
    assert "scored_frac" not in w
    assert w["chunks_referenced"] >= w["chunks_touched"] > 0
    assert 0 < w["touched_frac"] <= 1.0
    # full-decode modes keep the block accounting
    assert stats["taat"].get("scored_frac") == 1.0
