"""Hybrid sparse+dense retrieval via RRF (operators/hybrid.py)."""

from __future__ import annotations

import pytest

from partitioned_ef_ans_spark.operators import hybrid as h_mod


def _df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, doc_id long")


def test_rrf_fuse_hand_computed(spark):
    # query 0: doc 7 is rank 1 sparse + rank 2 dense; doc 8 rank 2 + 1
    # (tie by construction -> doc_id breaks it); doc 9 sparse-only.
    sparse = _df(spark, [(0, 1, 7), (0, 2, 8), (0, 3, 9)])
    dense = _df(spark, [(0, 1, 8), (0, 2, 7)])
    out = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["rrf"])
        for r in h_mod.rrf_fuse([sparse, dense], k=10).collect()
    }
    both = round(1.0 / 61 + 1.0 / 62, 7)
    assert out[(0, 1)] == (7, both)   # tie with 8 -> smaller doc_id first
    assert out[(0, 2)] == (8, both)
    assert out[(0, 3)] == (9, round(1.0 / 63, 7))
    assert len(out) == 3


def test_rrf_fuse_asymmetric_and_multi_query(spark):
    # query 1 appears only in the dense list (all-OOV sparse case)
    sparse = _df(spark, [(0, 1, 5)])
    dense = _df(spark, [(1, 1, 3), (1, 2, 4)])
    got = {
        (r["query_id"], r["rank"], r["doc_id"])
        for r in h_mod.rrf_fuse([sparse, dense], k=1).collect()
    }
    assert got == {(0, 1, 5), (1, 1, 3)}
    with pytest.raises(ValueError):
        h_mod.rrf_fuse([])


def test_gate_hybrid_matches_duckdb_oracle(spark, sf_med):
    duckdb = pytest.importorskip("duckdb")
    from partitioned_ef_ans_spark import gate_training as gt

    got = sorted(
        (r["variant"], r["query_id"], r["rank"], r["doc_id"], r["rrf"])
        for r in gt.q_hybrid_rrf(spark, sf_med).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"parquet_scan('{sf_med}/{t}.parquet')"
        )
    want = sorted(
        (v, q, r, d, s)
        for q, r, d, s, v in con.execute(gt.sql_hybrid_rrf()).fetchall()
    )
    assert got == want
    assert {v for v, *_ in got} == {"brute", "ivf", "persisted"}
    # the all-OOV gate query (id 4) must still retrieve via the dense
    # list (asymmetric fusion is load-bearing; both-list combination is
    # pinned by the hand-computed unit test — the synthetic embeddings
    # are independent of the text, so cross-list overlap at this SF is
    # not guaranteed)
    assert any(q == 4 for _v, q, _r, _d, _s in got)


def _qvecs(spark, sf_med, n=20):
    from pyspark.sql import functions as F

    embs = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    return embs, (
        embs.orderBy("vec_id").limit(n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_ivf_dense_probe_all_equals_brute(spark, sf_med):
    """nprobe >= n_centroids probes every bucket -> the candidate set
    is the whole corpus and IVF must EQUAL the brute-force baseline
    row-for-row (scores included)."""
    from partitioned_ef_ans_spark.operators import ann as ann_mod

    embs, qv = _qvecs(spark, sf_med)
    brute = h_mod.dense_topk_for_queries(qv, embs, k=5)
    ivf = ann_mod.ivf_dense_topk(
        qv, embs, k=5, n_centroids=8, nprobe=8
    )
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["cos"])
    assert sorted(map(key, ivf.collect())) == sorted(map(key, brute.collect()))


def test_ivf_dense_recall_vs_brute(spark, sf_med):
    """nprobe=2 of 8 buckets: top-10 recall vs brute force should stay
    usable (the corpus vector identical to the query is always in a
    probed bucket, so recall@1 of the self-hit is 1.0)."""
    from partitioned_ef_ans_spark.operators import ann as ann_mod

    embs, qv = _qvecs(spark, sf_med)
    brute = {
        (r["query_id"], r["doc_id"])
        for r in h_mod.dense_topk_for_queries(qv, embs, k=10).collect()
    }
    ivf_rows = ann_mod.ivf_dense_topk(
        qv, embs, k=10, n_centroids=8, nprobe=2
    ).collect()
    ivf = {(r["query_id"], r["doc_id"]) for r in ivf_rows}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.3f}"
    # the self-hit (query vector IS a corpus row here) lands in the
    # query's own nearest bucket, which is always probed
    self_hits = {
        r["query_id"] for r in ivf_rows
        if r["doc_id"] == r["query_id"] and r["rank"] == 1
    }
    assert len(self_hits) == 20


def test_ivf_dense_plan_has_no_corpus_cross_join(spark, sf_med):
    """The point of ivf_dense_topk: the corpus joins candidates by
    (bucket, salt) equi-keys — never through a cartesian/nested-loop
    join.  The only nested-loop joins allowed are the two
    broadcast-CENTROID sims (corpus-assign + query-probe), whose
    broadcast side is the n_centroids-row relation."""
    from partitioned_ef_ans_spark.operators import ann as ann_mod

    embs, qv = _qvecs(spark, sf_med)
    plan = ann_mod.ivf_dense_topk(
        qv, embs, k=5, n_centroids=8, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # centroid sims only (assign + probe, each subtree duplicated in
    # two consuming branches): every nested-loop join must build
    # (broadcast) its right side — the n_centroids-row relation; the
    # corpus/query relations are always the streamed side
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj <= 4, plan
    assert n_bnlj == plan.count("BroadcastNestedLoopJoin BuildRight"), plan


def test_ivf_dense_reused_assignment_and_salting(spark, sf_med):
    """Passing a precomputed corpus assignment (the amortized serving
    shape) and forcing hot-bucket salting (salt_target=1) must not
    change results."""
    from partitioned_ef_ans_spark.operators import ann as ann_mod

    embs, qv = _qvecs(spark, sf_med, n=8)
    cent = embs.orderBy("vec_id").limit(8).selectExpr(
        "vec_id AS cent_id", "embedding AS cvec"
    )
    assigned = ann_mod.assign_buckets(embs, cent)
    base = ann_mod.ivf_dense_topk(
        qv, embs, k=5, centroids=cent, nprobe=2
    )
    reused = ann_mod.ivf_dense_topk(
        qv, embs, k=5, centroids=cent, nprobe=2,
        assignments=assigned, salt_target=1,
    )
    # fully-amortized serving shape: assignment AND its salts are
    # precomputed once and passed in (no per-batch bucket-count
    # shuffle); results must be identical
    from partitioned_ef_ans_spark.operators.dedup import bucket_salts

    presalted = ann_mod.ivf_dense_topk(
        qv, embs, k=5, centroids=cent, nprobe=2,
        assignments=assigned, salt_target=1,
        salts=bucket_salts(assigned.groupBy("bucket").count(), 1),
    )
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["cos"])
    want = sorted(map(key, base.collect()))
    assert sorted(map(key, reused.collect())) == want
    assert sorted(map(key, presalted.collect())) == want


def test_hybrid_search_persisted_equals_in_session_composition(
    spark, sf_med, tmp_path
):
    """The end-to-end RAG entry point (hybrid_search_persisted): BM25
    from a PERSISTED text index + dense from a PERSISTED ANN store,
    RRF-fused — must equal the same composition built from in-session
    parts, and per-substrate tombstones must compose (delete a doc
    from the text index and a different one from the store; the fused
    result equals the fusion of the independently masked legs)."""
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.index import ann_store
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        delete_docs,
        load_tombstones,
    )
    from partitioned_ef_ans_spark.operators import ann as ann_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    embs = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    idx_dir = str(tmp_path / "idx")
    store_dir = str(tmp_path / "store")
    build_index_resumable(
        spark, docs.select("doc_id", "text"), idx_dir, codec="ans",
        num_parts=4, chunk_postings=2048,
    )
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    qs = [(0, ["spark", "join"]), (2, ["group", "group", "window"]),
          (5, ["dup"])]
    qdf = queries_to_df(spark, qs)
    qids = [q for q, _t in qs]
    qvecs = embs.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    def legs():
        index_df, _s, ts, codec, man = b_mod.load_index(spark, idx_dir)
        sparse = q_mod.run_ranked(
            spark, index_df, qdf, codec, man["num_docs"],
            man["avg_doc_len"], mode="blockmax", k=10, dtype="float32",
            term_stats_df=ts, tombstones=load_tombstones(idx_dir),
        )
        dense = ann_store.load_ann_index(spark, store_dir).query(
            qvecs, embs, k=10, nprobe=2
        )
        return sparse, dense

    got = h_mod.hybrid_search_persisted(
        spark, idx_dir, store_dir, qdf, qvecs, embs, k=10, nprobe=2,
    )
    sparse0, dense0 = legs()
    got_rows = rows(got)
    assert got_rows and got_rows == rows(
        h_mod.rrf_fuse([sparse0, dense0], k=10)
    )

    # per-substrate liveness: tombstone each leg's OWN top-1 (the
    # sparse winner in the TEXT index, the dense winner in the STORE —
    # distinct by construction below); the entry point must serve the
    # fusion of the independently masked legs, and it must change
    sp1 = sparse0.orderBy("query_id", "rank").first()["doc_id"]
    dn1 = next(
        r["doc_id"]
        for r in dense0.orderBy("query_id", "rank").collect()
        if r["doc_id"] != sp1
    )
    delete_docs(spark, idx_dir, [sp1])
    ann_store.delete_vectors(spark, store_dir, [int(dn1)])
    got2 = rows(h_mod.hybrid_search_persisted(
        spark, idx_dir, store_dir, qdf, qvecs, embs, k=10, nprobe=2,
    ))
    sparse1, dense1 = legs()
    assert got2 == rows(h_mod.rrf_fuse([sparse1, dense1], k=10))
    assert not any(r["doc_id"] == sp1 for r in sparse1.collect())
    assert not any(r["doc_id"] == dn1 for r in dense1.collect())
    assert got2 != got_rows


def test_hybrid_server_equals_one_shot_and_unpins(spark, sf_med, tmp_path):
    """HybridServer (load both substrates once, serve many batches)
    must return exactly what the one-shot hybrid_search_persisted
    returns, and close() must release every frame it pinned."""
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.index import ann_store
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    docs = spark.read.parquet(f"{sf_med}/documents.parquet")
    idx_dir = str(tmp_path / "idx")
    b_mod.build_index(
        spark, docs, idx_dir, codec="ans", chunk_postings=256,
        doc_col="doc_id", text_col="text",
    )
    embs = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    store_dir = str(tmp_path / "store")
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    qdf = queries_to_df(spark, [(0, ["dup"]), (1, ["dup", "the"])])
    qv = (
        embs.where(F.col("vec_id").isin([0, 1]))
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    one_shot = sorted(
        map(tuple, h_mod.hybrid_search_persisted(
            spark, idx_dir, store_dir, qdf, qv, embs, k=5, nprobe=2
        ).collect())
    )
    server = h_mod.HybridServer(spark, idx_dir, store_dir)
    try:
        for _ in range(2):  # a loop: the point of the server shape
            got = sorted(
                map(tuple, server.search(qdf, qv, embs, k=5, nprobe=2)
                    .collect())
            )
            assert got == one_shot and got
        assert all(df.is_cached for df in server._pinned)
    finally:
        server.close()
    assert not server._pinned


def test_hybrid_serving_tracks_both_streaming_substrates(
    spark, sf_med, tmp_path
):
    """The RAG loop under live ingestion: documents stream into the
    text index (LSM delta segments) while embeddings stream into the
    ANN store — hybrid_search_persisted over the streamed substrates
    must equal the same composition over substrates batch-built from
    everything.  This composes the two streaming planes end-to-end:
    each is individually exactly-once-in-effect, so the fused serving
    relation must be too."""
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.index import ann_store
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
    )
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.streaming.ann_update import (
        start_ann_update_stream,
    )
    from partitioned_ef_ans_spark.streaming.index_update import (
        start_index_update_stream,
    )

    docs = spark.read.parquet(f"{sf_med}/documents.parquet").select(
        "doc_id", F.col("text").alias("content")
    )
    embs = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    d_ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    v_ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    d_cut = d_ids[2 * len(d_ids) // 3]
    v_cut = v_ids[2 * len(v_ids) // 3]

    live_idx = str(tmp_path / "idx_live")
    build_index_resumable(
        spark, docs.where(F.col("doc_id") <= d_cut), live_idx,
        codec="ans", num_parts=4, chunk_postings=256,
        text_col="content",
    )
    docs.where(F.col("doc_id") > d_cut).write.parquet(
        str(tmp_path / "doc_in")
    )
    start_index_update_stream(
        spark, str(tmp_path / "doc_in"), live_idx,
        str(tmp_path / "doc_ckpt"), mode="delta",
    )

    live_store = str(tmp_path / "store_live")
    ann_store.build_ann_index(
        spark, embs.where(F.col("vec_id") <= v_cut), live_store,
        n_centroids=8, trained=False, sq8=False, engine="np",
    )
    embs.where(F.col("vec_id") > v_cut).select(
        "vec_id", "embedding"
    ).write.parquet(str(tmp_path / "emb_in"))
    start_ann_update_stream(
        spark, str(tmp_path / "emb_in"), live_store,
        str(tmp_path / "emb_ckpt"),
    )

    full_idx = str(tmp_path / "idx_full")
    build_index_resumable(
        spark, docs, full_idx, codec="ans", num_parts=4,
        chunk_postings=256, text_col="content",
    )
    full_store = str(tmp_path / "store_full")
    ann_store.build_ann_index(
        spark, embs, full_store, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )

    qdf = queries_to_df(spark, [(0, ["dup"]), (1, ["dup", "the"])])
    qv = embs.where(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def run(idx_dir, store_dir):
        return sorted(
            map(tuple, h_mod.hybrid_search_persisted(
                spark, idx_dir, store_dir, qdf, qv, embs, k=5, nprobe=2
            ).collect())
        )

    got = run(live_idx, live_store)
    want = run(full_idx, full_store)
    assert got == want and got
