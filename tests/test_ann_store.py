"""Persisted ANN index (index/ann_store.py).

Contract: a store-served query is bit-identical to the same query
computed from scratch (artifacts round-trip parquet exactly), appends
under frozen centroids serve exactly as a build that had the vectors
from the start WITH THE SAME frozen models, and mutators are immune to
the CacheManager path-aliasing (a caller-cached artifact scan must not
feed a stale listing back into the append)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.index import ann_store
from partitioned_ef_ans_spark.operators import ann


def _embs(spark, sf_med):
    return spark.read.parquet(f"{sf_med}/embeddings.parquet")


def _qv(embs, n=5):
    return (
        embs.orderBy("vec_id")
        .limit(n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def store_dir(tmp_path):
    return str(tmp_path / "annstore")


def test_store_serving_equals_from_scratch_pinned(spark, sf_med, store_dir):
    """build -> load -> query == direct ivf_dense_topk with the same
    pinned centroids (parquet round-trip is lossless; the persisted
    assignments/salts change nothing)."""
    embs = _embs(spark, sf_med)
    man = ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        pq=True, pq_m=8, pq_ks=16, engine="np",
    )
    assert man["n_vectors"] == embs.count()
    idx = ann_store.load_ann_index(spark, store_dir)
    got = idx.query(_qv(embs), embs, k=5, nprobe=2)
    want = ann.ivf_dense_topk(
        _qv(embs), embs, k=5, n_centroids=8, nprobe=2
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_store_serving_equals_from_scratch_trained(spark, sf_med, store_dir):
    """Trained-centroid store == direct query with kmeans_centroids
    computed in-session (the deterministic Lloyd loop round-trips)."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=True,
        kmeans_iters=2, sq8=False, engine="np",
    )
    idx = ann_store.load_ann_index(spark, store_dir)
    got = idx.query(_qv(embs), embs, k=5, nprobe=2)
    cent = ann.kmeans_centroids(embs, n_centroids=8, iters=2)
    want = ann.ivf_dense_topk(_qv(embs), embs, k=5, centroids=cent, nprobe=2)
    assert _rows(got) == _rows(want)


def test_store_sq8_and_pq_twins_serve(spark, sf_med, store_dir):
    """quant='sq8' from the PERSISTED twin == quant='sq8' with the twin
    re-derived in-session (sq8_quantize is deterministic), and the
    keep-all mult equals the unquantized store query; quant='pq'
    serves from the persisted codebooks/codes."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        pq=True, pq_m=8, pq_ks=16, engine="np",
    )
    idx = ann_store.load_ann_index(spark, store_dir)
    got = idx.query(_qv(embs), embs, k=5, nprobe=2, quant="sq8",
                    rescore_mult=10_000)
    plain = idx.query(_qv(embs), embs, k=5, nprobe=2)
    assert _rows(got) == _rows(plain)
    rederived = ann.ivf_dense_topk(
        _qv(embs), embs, k=5, n_centroids=8, nprobe=2, quant="sq8",
        rescore_mult=3,
    )
    stored = idx.query(_qv(embs), embs, k=5, nprobe=2, quant="sq8",
                       rescore_mult=3)
    assert _rows(stored) == _rows(rederived)
    pq_served = idx.query(_qv(embs), embs, k=5, nprobe=2, quant="pq",
                          rescore_mult=3)
    pq_direct = ann.ivf_dense_topk(
        _qv(embs), embs, k=5, n_centroids=8, nprobe=2, quant="pq",
        rescore_mult=3,
    )
    assert _rows(pq_served) == _rows(pq_direct)


def test_store_missing_twin_raises(spark, sf_med, store_dir):
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        pq=False, engine="np",
    )
    idx = ann_store.load_ann_index(spark, store_dir)
    with pytest.raises(ValueError, match="sq8"):
        idx.query(_qv(embs), embs, quant="sq8")
    with pytest.raises(ValueError, match="pq"):
        idx.query(_qv(embs), embs, quant="pq")


def test_append_serves_like_frozen_build(spark, sf_med, store_dir):
    """Build on the low half of the ids, append the high half: queries
    against the grown store must EQUAL a from-scratch query over the
    full table under the SAME frozen centroids (the 8 smallest ids of
    the low half == of the full table, so the pinned sets agree)."""
    embs = _embs(spark, sf_med)
    ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    low = embs.where(F.col("vec_id") <= cut)
    high = embs.where(F.col("vec_id") > cut)
    assert low.count() > 8 and high.count() > 0
    ann_store.build_ann_index(
        spark, low, store_dir, n_centroids=8, trained=False, sq8=True,
        pq=True, pq_m=8, pq_ks=16, engine="np",
    )
    man = ann_store.add_vectors(spark, store_dir, high, engine="np")
    assert man["n_vectors"] == embs.count()
    assert man["max_vec_id"] == ids[-1]
    idx = ann_store.load_ann_index(spark, store_dir)
    got = idx.query(_qv(embs), embs, k=5, nprobe=2)
    want = ann.ivf_dense_topk(
        _qv(embs), embs, k=5, n_centroids=8, nprobe=2
    )
    assert _rows(got) == _rows(want)
    # the quantized twins grew with the append too
    got_q = idx.query(_qv(embs), embs, k=5, nprobe=2, quant="sq8",
                      rescore_mult=10_000)
    assert _rows(got_q) == _rows(want)
    ver = ann_store.verify_ann_index(spark, store_dir)
    assert ver["ok"], ver


def test_append_rejects_id_collisions_and_dim_mismatch(
    spark, sf_med, store_dir
):
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    with pytest.raises(ValueError, match="already present"):
        ann_store.add_vectors(spark, store_dir, embs.limit(3), engine="np")
    bad = embs.limit(1).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.slice("embedding", 1, 4).alias("embedding"),
    )
    with pytest.raises(ValueError, match="dim mismatch"):
        ann_store.add_vectors(spark, store_dir, bad, engine="np")


def test_append_refreshes_stale_cached_artifact_scans(
    spark, sf_med, store_dir
):
    """The CacheManager aliasing regression, ANN edition: cache a scan
    of assignments.parquet BEFORE the append; the post-append query
    must still see the appended vectors (the mutator refreshes the
    path on entry/exit, so neither its own reads nor later serving go
    through the stale cached listing)."""
    embs = _embs(spark, sf_med)
    ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    low = embs.where(F.col("vec_id") <= cut)
    high = embs.where(F.col("vec_id") > cut)
    ann_store.build_ann_index(
        spark, low, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    pinned = spark.read.parquet(f"{store_dir}/assignments.parquet").cache()
    n_before = pinned.count()  # materialize the trap
    try:
        ann_store.add_vectors(spark, store_dir, high, engine="np")
        idx = ann_store.load_ann_index(spark, store_dir)
        assert idx.assignments.count() == n_before + high.count()
        # an appended vector is servable: its own row scores cos 1.0
        # (top-1 may be an identical-embedding dup twin with a smaller
        # id — assert the self-hit, not the winner)
        probe_id = ids[-1]
        assert idx.assignments.where(
            F.col("vec_id") == probe_id
        ).count() == 1
        qv = (
            embs.where(F.col("vec_id") == probe_id)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        got = idx.query(qv, embs, k=5, nprobe=8)
        self_hit = got.where(F.col("doc_id") == probe_id).collect()
        assert self_hit and self_hit[0]["cos"] == 1.0
    finally:
        pinned.unpersist()


def test_delete_masks_and_compact_serves_bit_identically(
    spark, sf_med, store_dir
):
    """Deletion contract (the text index's, ANN edition): tombstoned
    ids vanish from served results immediately (mask-only), the masked
    relation equals an independent derivation over survivor assignments
    under the SAME frozen centroids, and physical compaction changes
    nothing a query can see (bit-identical rows before/after)."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    dead = [
        r["vec_id"]
        for r in embs.select("vec_id").collect()
        if r["vec_id"] % 5 == 2
    ]
    assert dead
    info = ann_store.delete_vectors(spark, store_dir, dead)
    assert info["tombstones_total"] == len(dead)
    idx = ann_store.load_ann_index(spark, store_dir)
    masked = idx.query(_qv(embs), embs, k=5, nprobe=2)
    got = _rows(masked)
    assert got and not any(t[2] % 5 == 2 for t in got)
    # independent derivation: survivor-only assignments under the same
    # pinned centroids (pinned over the FULL table — deletion does not
    # retrain models, like frozen BM25 stats under text tombstones)
    cent = ann._resolve_centroids(embs, 8, None)
    surv = embs.where(F.col("vec_id") % 5 != 2)
    want = ann.ivf_dense_topk(
        _qv(embs), embs, k=5, nprobe=2, centroids=cent,
        assignments=ann.assign_buckets(surv, cent, engine="np"),
    )
    assert got == _rows(want)
    # quantized serving masks identically (keep-all mult == plain)
    q8 = idx.query(_qv(embs), embs, k=5, nprobe=2, quant="sq8",
                   rescore_mult=10_000)
    assert _rows(q8) == got
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]
    # a tombstoned id is still physically present -> re-add rejected
    back = embs.where(F.col("vec_id") == dead[0])
    with pytest.raises(ValueError, match="already present"):
        ann_store.add_vectors(spark, store_dir, back, engine="np")
    n_before = idx.manifest["n_vectors"]
    res = ann_store.compact_ann_index(spark, store_dir)
    assert res["removed"] == len(dead)
    assert not os.path.exists(f"{store_dir}/tombstones.parquet")
    idx2 = ann_store.load_ann_index(spark, store_dir)
    assert idx2.manifest["n_vectors"] == n_before - len(dead)
    assert idx2.tombstones is None
    assert _rows(idx2.query(_qv(embs), embs, k=5, nprobe=2)) == got
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]
    # after the fold the id range is free again
    man = ann_store.add_vectors(spark, store_dir, back, engine="np")
    assert man["n_vectors"] == n_before - len(dead) + 1


def test_delete_is_idempotent_and_ignores_absent_ids(
    spark, sf_med, store_dir
):
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=4, trained=False, sq8=False,
        engine="np",
    )
    ids = [r["vec_id"] for r in embs.select("vec_id").limit(3).collect()]
    info = ann_store.delete_vectors(
        spark, store_dir, ids + [99_999_999]
    )
    assert info["requested"] == 4
    assert info["ignored_absent"] == 1
    assert info["tombstones_total"] == 3
    again = ann_store.delete_vectors(spark, store_dir, ids)
    assert again["tombstones_total"] == 3 and again["previously"] == 3
    assert ann_store.compact_ann_index(spark, store_dir)["removed"] == 3
    # compacting a store with no sidecar is a no-op
    assert ann_store.compact_ann_index(spark, store_dir)["removed"] == 0


def test_compact_refuses_to_remove_every_vector(spark, sf_med, store_dir):
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=4, trained=False, sq8=False,
        engine="np",
    )
    all_ids = [r["vec_id"] for r in embs.select("vec_id").collect()]
    ann_store.delete_vectors(spark, store_dir, all_ids)
    with pytest.raises(ValueError, match="every vector"):
        ann_store.compact_ann_index(spark, store_dir)


def test_compact_refreshes_stale_cached_scans(spark, sf_med, store_dir):
    """CacheManager aliasing, compaction edition: a caller-cached scan
    of assignments must not feed the pre-compaction listing into
    post-compaction serving."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    dead = [
        r["vec_id"]
        for r in embs.select("vec_id").collect()
        if r["vec_id"] % 7 == 0
    ]
    ann_store.delete_vectors(spark, store_dir, dead)
    pinned = spark.read.parquet(f"{store_dir}/assignments.parquet").cache()
    n_physical = pinned.count()  # materialize the trap (pre-fold rows)
    try:
        ann_store.compact_ann_index(spark, store_dir)
        idx = ann_store.load_ann_index(spark, store_dir)
        assert idx.assignments.count() == n_physical - len(dead)
        got = _rows(idx.query(_qv(embs), embs, k=5, nprobe=8))
        assert got and not any(t[2] % 7 == 0 for t in got)
    finally:
        pinned.unpersist()


def test_append_retry_after_twin_crash_heals_orphans(
    spark, sf_med, store_dir
):
    """Crash replay: an append that died after writing its sq8 twin
    rows but BEFORE the assignments write leaves orphan twin rows; a
    retry of the same batch must heal them (drop + re-append once) —
    without the heal the twin would hold the batch twice and quantized
    serving would duplicate candidates."""
    embs = _embs(spark, sf_med)
    ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    low = embs.where(F.col("vec_id") <= cut)
    high = embs.where(F.col("vec_id") > cut)
    ann_store.build_ann_index(
        spark, low, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    # simulate the crash window: twin rows appended, assignments not
    ann.sq8_quantize(high).write.mode("append").parquet(
        f"{store_dir}/sq8.parquet"
    )
    ver = ann_store.verify_ann_index(spark, store_dir)
    assert not ver["ok"] and not ver["checks"]["sq8_no_orphans"]
    man = ann_store.add_vectors(spark, store_dir, high, engine="np")
    assert man["n_vectors"] == embs.count()
    ver2 = ann_store.verify_ann_index(spark, store_dir)
    assert ver2["ok"], ver2
    idx = ann_store.load_ann_index(spark, store_dir)
    # exactly once in the twin, and quantized serving has no dup rows
    n_high = high.count()
    assert idx.sq8.where(F.col("vec_id") > cut).count() == n_high
    got = idx.query(_qv(embs), embs, k=5, nprobe=2, quant="sq8",
                    rescore_mult=10_000)
    rows = got.collect()
    assert len({(r["query_id"], r["doc_id"]) for r in rows}) == len(rows)
    want = ann.ivf_dense_topk(_qv(embs), embs, k=5, n_centroids=8, nprobe=2)
    assert _rows(got) == _rows(want)


def test_repair_heals_orphans_stale_counts_and_dead_tombstones(
    spark, sf_med, store_dir
):
    """repair_ann_index re-derives every derivable artifact: orphan
    twin rows dropped, bucket_counts and manifest accounting recomputed
    from assignments, tombstones referencing no assignment row pruned
    (sidecar retired when none survive)."""
    import json as _json

    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    # orphan twin rows (fresh ids, never assigned)
    ghost = embs.limit(4).select(
        (F.col("vec_id") + F.lit(5_000_000)).alias("vec_id"), "embedding"
    )
    ann.sq8_quantize(ghost).write.mode("append").parquet(
        f"{store_dir}/sq8.parquet"
    )
    # stale manifest accounting + a tombstone for a row that is gone
    with open(f"{store_dir}/manifest.json") as fh:
        man = _json.load(fh)
    man["n_vectors"] = 1
    man["n_tombstones"] = 7
    with open(f"{store_dir}/manifest.json", "w") as fh:
        _json.dump(man, fh)
    spark.createDataFrame([(123_456_789,)], "vec_id long").write.parquet(
        f"{store_dir}/tombstones.parquet"
    )
    assert not ann_store.verify_ann_index(spark, store_dir)["ok"]
    rep = ann_store.repair_ann_index(spark, store_dir)
    assert rep["orphan_twin_ids_dropped"] == {"sq8": 4}
    assert rep["n_vectors"] == embs.count()
    assert rep["n_tombstones"] == 0
    assert not os.path.exists(f"{store_dir}/tombstones.parquet")
    ver = ann_store.verify_ann_index(spark, store_dir)
    assert ver["ok"], ver
    idx = ann_store.load_ann_index(spark, store_dir)
    got = idx.query(_qv(embs), embs, k=5, nprobe=2)
    want = ann.ivf_dense_topk(_qv(embs), embs, k=5, n_centroids=8, nprobe=2)
    assert _rows(got) == _rows(want)


def test_rebuild_over_cached_store_serves_fresh(spark, sf_med, store_dir):
    """Rebuild a store over an existing dir while the session holds a
    CACHED scan of its centroids: the rebuild (different n_centroids)
    must serve from the NEW artifacts, not the cached pre-rebuild
    listing (build takes the writer lock + refreshes like add_vectors)."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=4, trained=False, sq8=False,
        engine="np",
    )
    trap = spark.read.parquet(f"{store_dir}/centroids.parquet").cache()
    assert trap.count() == 4  # materialize the stale-cache trap
    try:
        ann_store.build_ann_index(
            spark, embs, store_dir, n_centroids=8, trained=False,
            sq8=False, engine="np",
        )
        idx = ann_store.load_ann_index(spark, store_dir)
        assert idx.centroids.count() == 8
        got = idx.query(_qv(embs), embs, k=5, nprobe=2)
        want = ann.ivf_dense_topk(
            _qv(embs), embs, k=5, n_centroids=8, nprobe=2
        )
        assert _rows(got) == _rows(want)
    finally:
        trap.unpersist()


def test_snapshot_pins_pre_delete_view(spark, sf_med, store_dir, tmp_path):
    """snapshot_ann_index hardlink-pins a consistent view: deleting
    from the LIVE store afterwards must not leak into the snapshot
    (same reader-pinning contract as the text index's snapshots)."""
    from partitioned_ef_ans_spark.index.checkpoint import release_snapshot

    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    before = _rows(
        ann_store.load_ann_index(spark, store_dir).query(
            _qv(embs), embs, k=5, nprobe=2
        )
    )
    snap = ann_store.snapshot_ann_index(store_dir, str(tmp_path / "snap"))
    dead = [t[2] for t in before]  # delete every doc the top-k returned
    ann_store.delete_vectors(spark, store_dir, dead)
    live = _rows(
        ann_store.load_ann_index(spark, store_dir).query(
            _qv(embs), embs, k=5, nprobe=2
        )
    )
    pinned = _rows(
        ann_store.load_ann_index(spark, snap).query(
            _qv(embs), embs, k=5, nprobe=2
        )
    )
    assert pinned == before
    assert not set(t[2] for t in live) & set(dead)
    release_snapshot(snap)
    other = tmp_path / "other"
    other.mkdir()
    (other / "manifest.json").write_text('{"kind": "text_index"}')
    with pytest.raises(ValueError, match="not an ANN index"):
        ann_store.snapshot_ann_index(str(other))


def test_streaming_embeddings_fold_into_live_store(
    spark, sf_med, tmp_path, store_dir
):
    """Two waves of streamed embedding rows append into the persisted
    store (streaming/ann_update.py); final serving equals a
    from-scratch query over everything under the same frozen pinned
    centroids, and a full replay from a fresh checkpoint is a no-op
    (skip_existing = the exactly-once-in-effect contract)."""
    from partitioned_ef_ans_spark.streaming.ann_update import (
        start_ann_update_stream,
    )

    embs = _embs(spark, sf_med)
    ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    base = embs.where(F.col("vec_id") <= c1)
    waves = [
        embs.where((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)),
        embs.where(F.col("vec_id") > c2),
    ]
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    ann_store.build_ann_index(
        spark, base, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    for wave in waves:
        wave.select("vec_id", "embedding").write.mode("append").parquet(inp)
        start_ann_update_stream(spark, inp, store_dir, ckpt)

    idx = ann_store.load_ann_index(spark, store_dir)
    assert idx.manifest["n_vectors"] == len(ids)
    got = _rows(idx.query(_qv(embs), embs, k=5, nprobe=2))
    want = _rows(ann.ivf_dense_topk(
        _qv(embs), embs, k=5, n_centroids=8, nprobe=2
    ))
    assert got == want
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]
    # fresh checkpoint -> the file source re-delivers EVERY row; the
    # skip_existing filter must make the whole replay a no-op
    start_ann_update_stream(
        spark, inp, store_dir, str(tmp_path / "ckpt_replay")
    )
    idx2 = ann_store.load_ann_index(spark, store_dir)
    assert idx2.manifest["n_vectors"] == len(ids)
    assert _rows(idx2.query(_qv(embs), embs, k=5, nprobe=2)) == want
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]


def test_masked_serving_plan_shape(spark, sf_med, store_dir):
    """The physical plan of tombstone-masked serving must keep the
    100 TB shape: the mask is a BROADCAST anti-join on the assignment
    scan (forced — never a corpus-sized shuffle of the tombstones) and
    the assignment scan is pruned to its two columns.  The corpus
    embedding joins are deliberately NOT forced-broadcast: Catalyst
    picks broadcast at toy sizes and shuffle joins at scale."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    ann_store.delete_vectors(
        spark, store_dir,
        [r["vec_id"] for r in embs.select("vec_id").limit(3).collect()],
    )
    idx = ann_store.load_ann_index(spark, store_dir)
    plan = (
        idx.query(_qv(embs), embs, k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    anti_lines = [
        ln for ln in plan.splitlines() if "LeftAnti" in ln
    ]
    assert anti_lines, plan
    assert all("BroadcastHashJoin" in ln for ln in anti_lines), anti_lines


def test_ann_store_interaction_fuzz(spark, sf_med, store_dir, tmp_path):
    """Seeded schedule of add / delete / merge / compact / repair with
    full invariants after EVERY step (the ANN edition of the text
    index's interaction fuzz): served top-k must always equal the
    independent derivation over the LIVE vectors under the store's
    frozen centroids, verify_ann_index must stay ok, and each merge is
    preceded by a scatter-gather check (sharded serving over
    [main, side] at all-bucket probes == brute force over the live
    union)."""
    import random

    rng = random.Random(20260820)
    embs = _embs(spark, sf_med)
    all_ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    live = set(all_ids[: len(all_ids) * 3 // 5])
    pool = [i for i in all_ids if i not in live]
    tombstoned: set = set()
    ann_store.build_ann_index(
        spark, embs.where(F.col("vec_id").isin(list(live))), store_dir,
        n_centroids=8, trained=False, sq8=True, engine="np",
    )
    qv = _qv(embs, 3)

    def check(step: str) -> None:
        idx = ann_store.load_ann_index(spark, store_dir)
        # read centroids fresh: a rebuild step re-pins them over the
        # surviving id set, and the independent derivation must use
        # the store's CURRENT frozen models
        cent = spark.read.parquet(f"{store_dir}/centroids.parquet")
        got = _rows(idx.query(qv, embs, k=5, nprobe=2))
        served = live - tombstoned
        want = _rows(ann.ivf_dense_topk(
            qv, embs, k=5, nprobe=2, centroids=cent,
            assignments=ann.assign_buckets(
                embs.where(F.col("vec_id").isin(list(served))), cent,
                engine="np",
            ),
        ))
        assert got == want, step
        ver = ann_store.verify_ann_index(spark, store_dir)
        assert ver["ok"], (step, ver)

    check("build")
    ops = ["add", "delete", "merge", "compact", "delete", "rebuild",
           "add", "repair", "delete", "merge", "compact", "add"]
    for n, op in enumerate(ops):
        if op == "merge" and pool:
            from partitioned_ef_ans_spark.operators import hybrid as h_mod

            batch = [pool.pop() for _ in range(min(12, len(pool)))]
            side = str(tmp_path / f"side{n}")
            ann_store.build_ann_index(
                spark, embs.where(F.col("vec_id").isin(batch)), side,
                n_centroids=4, trained=False, sq8=False, engine="np",
            )
            side_dead = batch[:2]
            ann_store.delete_vectors(spark, side, side_dead)
            got = _rows(ann_store.query_sharded_ann(
                spark, [store_dir, side], qv, embs, k=5, nprobe=8,
            ))
            union_live = (live - tombstoned) | set(batch[2:])
            want = _rows(h_mod.dense_topk_for_queries(
                qv, embs.where(F.col("vec_id").isin(list(union_live))),
                k=5,
            ).select("query_id", "rank", "doc_id", "cos"))
            assert got == want, f"{n}:sharded"
            ann_store.merge_ann_stores(spark, store_dir, [side], embs)
            live |= set(batch[2:])
        elif op == "add" and pool:
            batch = [pool.pop() for _ in range(min(15, len(pool)))]
            ann_store.add_vectors(
                spark, store_dir,
                embs.where(F.col("vec_id").isin(batch)), engine="np",
            )
            live |= set(batch)
        elif op == "delete":
            victims = rng.sample(
                sorted(live - tombstoned),
                min(10, len(live - tombstoned) - 1),
            )
            ann_store.delete_vectors(spark, store_dir, victims)
            tombstoned |= set(victims)
        elif op == "compact":
            ann_store.compact_ann_index(spark, store_dir)
            live -= tombstoned
            pool += sorted(tombstoned)
            tombstoned = set()
        elif op == "repair":
            ann_store.repair_ann_index(spark, store_dir)
        elif op == "rebuild":
            # the journaled rebuild: retires the sidecar + stale twins
            # in its commit, re-pins centroids over the survivors
            keep = sorted(live - tombstoned)
            ann_store.build_ann_index(
                spark, embs.where(F.col("vec_id").isin(keep)), store_dir,
                n_centroids=8, trained=False, sq8=True, engine="np",
            )
            pool += sorted(tombstoned)
            live -= tombstoned
            tombstoned = set()
        check(f"{n}:{op}")


def test_counts_self_heal_and_not_an_index(spark, sf_med, store_dir, tmp_path):
    """bucket_counts is derivable: deleting it must not break loading
    (self-heal recomputes); opening a non-store dir raises."""
    import shutil

    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    shutil.rmtree(f"{store_dir}/bucket_counts.parquet")
    idx = ann_store.load_ann_index(spark, store_dir)
    assert idx.bucket_counts.count() > 0
    # the reader path must NOT write (it holds no lease — a write here
    # would race a lock-holding mutator's atomic counts swap): counts
    # are served as a lazy groupBy until repair re-materializes them
    assert not os.path.isdir(f"{store_dir}/bucket_counts.parquet")
    embs2 = _embs(spark, sf_med)
    assert idx.query(_qv(embs2), embs2, k=5, nprobe=2).count() > 0
    ann_store.repair_ann_index(spark, store_dir)
    assert os.path.isdir(f"{store_dir}/bucket_counts.parquet")
    other = str(tmp_path / "not_a_store")
    os.makedirs(other)
    with pytest.raises(FileNotFoundError):
        ann_store.load_ann_index(spark, other)


def test_gate_ivf_store_variant_nonempty(spark, sf_med):
    """The gate family's ivf_store variant runs end-to-end and carries
    the family shape (driver hashes it against the from-scratch SQL)."""
    from partitioned_ef_ans_spark import gate_training as gt

    df = gt.q_ann_ivf_store(spark, sf_med)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "rank", "neighbor", "cos"]


def test_rebuild_clears_stale_tombstones_and_twins(spark, sf_med, store_dir):
    """A rebuild starts the store's liveness and twin set over: a
    tombstone sidecar left by the previous build must not silently
    mask the new build's vectors, and a twin dir the rebuild does not
    produce must disappear (load picks twins up by directory
    presence — a stale one would serve stale quantized rows)."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    first = int(embs.orderBy("vec_id").first()["vec_id"])
    ann_store.delete_vectors(spark, store_dir, [first])
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    assert not os.path.exists(f"{store_dir}/tombstones.parquet")
    assert not os.path.isdir(f"{store_dir}/sq8.parquet")
    idx = ann_store.load_ann_index(spark, store_dir)
    assert idx.tombstones is None and idx.sq8 is None
    # the previously deleted vector is reachable again: all-bucket
    # probe must rank the self-hit first
    qv = _qv(embs, n=1)
    top = idx.query(qv, embs, k=1, nprobe=8).collect()
    assert top and top[0]["doc_id"] == first
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]


def test_append_rejects_intra_batch_duplicates(spark, sf_med, store_dir):
    """Duplicate vec_ids WITHIN one batch would append double
    assignment/twin rows — a torn state verify flags forever and
    repair cannot clear; add_vectors must reject them up front on
    both the strict and the skip_existing paths."""
    embs = _embs(spark, sf_med)
    man = ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    fresh = int(man["max_vec_id"]) + 1
    one = embs.limit(1).select(
        F.lit(fresh).cast("long").alias("vec_id"), "embedding"
    )
    batch = one.unionAll(one)
    with pytest.raises(ValueError, match="duplicate"):
        ann_store.add_vectors(spark, store_dir, batch)
    with pytest.raises(ValueError, match="duplicate"):
        ann_store.add_vectors(spark, store_dir, batch, skip_existing=True)
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]


def test_repair_rolls_forward_interrupted_compaction(
    spark, sf_med, store_dir
):
    """Compaction crash window: the sq8 twin was rewritten (tombstoned
    rows folded out) but the crash hit before the assignments rewrite.
    verify fails the twin coverage check and orphan-dropping alone can
    never clear it — repair must detect that the missing twin ids are
    exactly tombstoned ids and roll the compaction FORWARD, after
    which verify is green and the deleted ids stay unreachable."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    dead = [int(r["vec_id"]) for r in embs.orderBy("vec_id").limit(3).collect()]
    ann_store.delete_vectors(spark, store_dir, dead)
    # replay compact's FIRST rewrite only (fold sq8, leave assignments)
    import shutil

    q8_path = f"{store_dir}/sq8.parquet"
    staging = f"{q8_path}.crashsim"
    spark.read.parquet(q8_path).where(
        ~F.col("vec_id").isin(dead)
    ).write.parquet(staging)
    shutil.rmtree(q8_path)
    os.rename(staging, q8_path)
    spark.catalog.refreshByPath(store_dir)
    assert not ann_store.verify_ann_index(spark, store_dir)["ok"]
    rep = ann_store.repair_ann_index(spark, store_dir)
    assert rep["twin_heal"].get("compaction_rolled_forward") is True
    v = ann_store.verify_ann_index(spark, store_dir)
    assert v["ok"], v
    idx = ann_store.load_ann_index(spark, store_dir)
    assert idx.tombstones is None
    got = {
        r["doc_id"]
        for r in idx.query(_qv(embs), embs, k=5, nprobe=8).collect()
    }
    assert not (got & set(dead))


def test_repair_amputates_untraceable_twin(spark, sf_med, store_dir):
    """Twin rows missing for LIVE (untombstoned) ids with no source
    table recorded: the rows are underivable, so repair amputates the
    twin (drops the dir, clears the manifest flag) instead of looping
    forever — the store serves exactly without the acceleration."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np",
    )
    lost = [int(r["vec_id"]) for r in embs.orderBy("vec_id").limit(2).collect()]
    import shutil

    q8_path = f"{store_dir}/sq8.parquet"
    staging = f"{q8_path}.crashsim"
    spark.read.parquet(q8_path).where(
        ~F.col("vec_id").isin(lost)
    ).write.parquet(staging)
    shutil.rmtree(q8_path)
    os.rename(staging, q8_path)
    spark.catalog.refreshByPath(store_dir)
    assert not ann_store.verify_ann_index(spark, store_dir)["ok"]
    rep = ann_store.repair_ann_index(spark, store_dir)
    assert rep["twin_heal"] == {"sq8": {"amputated": 2}}
    assert not os.path.isdir(q8_path)
    v = ann_store.verify_ann_index(spark, store_dir)
    assert v["ok"], v
    idx = ann_store.load_ann_index(spark, store_dir)
    assert idx.sq8 is None
    assert idx.query(_qv(embs), embs, k=5, nprobe=2).count() > 0


def test_repair_rederives_twin_from_recorded_source(
    spark, sf_med, store_dir
):
    """Same missing-live-twin-rows state, but the manifest records a
    readable source embeddings table: repair re-derives the missing
    twin rows from it (the twin is a derivable acceleration) and the
    healed store serves sq8-quantized queries identically to an
    untouched build."""
    embs = _embs(spark, sf_med)
    src = f"{sf_med}/embeddings.parquet"
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=True,
        engine="np", source=src,
    )
    want = _rows(
        ann_store.load_ann_index(spark, store_dir).query(
            _qv(embs), embs, k=5, nprobe=2, quant="sq8"
        )
    )
    lost = [int(r["vec_id"]) for r in embs.orderBy("vec_id").limit(2).collect()]
    import shutil

    q8_path = f"{store_dir}/sq8.parquet"
    staging = f"{q8_path}.crashsim"
    spark.read.parquet(q8_path).where(
        ~F.col("vec_id").isin(lost)
    ).write.parquet(staging)
    shutil.rmtree(q8_path)
    os.rename(staging, q8_path)
    spark.catalog.refreshByPath(store_dir)
    rep = ann_store.repair_ann_index(spark, store_dir)
    assert rep["twin_heal"] == {"sq8": {"rederived": 2}}
    v = ann_store.verify_ann_index(spark, store_dir)
    assert v["ok"], v
    got = _rows(
        ann_store.load_ann_index(spark, store_dir).query(
            _qv(embs), embs, k=5, nprobe=2, quant="sq8"
        )
    )
    assert got == want


def _build_parity_shards(spark, embs, tmp_path, sq8=False):
    dirs = []
    for p in (0, 1):
        d = str(tmp_path / f"shard{p}")
        ann_store.build_ann_index(
            spark, embs.where(F.col("vec_id") % 2 == p), d, n_centroids=8,
            trained=False, sq8=sq8, engine="np",
        )
        dirs.append(d)
    return dirs


def test_sharded_query_all_probe_equals_brute_over_union(
    spark, sf_med, tmp_path
):
    """Scatter-gather over parity-split stores with nprobe covering
    every shard's centroids: the candidate set is the union corpus, so
    the fused result must equal brute force over ALL vectors
    row-for-row — cosine needs no cross-shard statistic, which is what
    makes the gather exact by construction."""
    from partitioned_ef_ans_spark.operators import hybrid as h_mod

    embs = _embs(spark, sf_med)
    dirs = _build_parity_shards(spark, embs, tmp_path)
    qv = _qv(embs)
    got = ann_store.query_sharded_ann(spark, dirs, qv, embs, k=5, nprobe=8)
    want = h_mod.dense_topk_for_queries(qv, embs, k=5)
    cols = ["query_id", "rank", "doc_id", "cos"]
    assert _rows(got.select(*cols)) == _rows(want.select(*cols))
    with pytest.raises(ValueError):
        ann_store.query_sharded_ann(spark, [], qv, embs)


def test_sharded_query_masks_per_shard_tombstones(spark, sf_med, tmp_path):
    """Each shard masks its OWN tombstone sidecar inside the gather:
    deleting ids from one store removes them from the fused result and
    the rest equals brute force over the surviving union."""
    from partitioned_ef_ans_spark.operators import hybrid as h_mod

    embs = _embs(spark, sf_med)
    dirs = _build_parity_shards(spark, embs, tmp_path)
    dead = [
        int(r["vec_id"])
        for r in embs.where(F.col("vec_id") % 2 == 0)
        .orderBy("vec_id")
        .limit(2)
        .collect()
    ]
    ann_store.delete_vectors(spark, dirs[0], dead)
    qv = _qv(embs)
    got = ann_store.query_sharded_ann(spark, dirs, qv, embs, k=5, nprobe=8)
    want = h_mod.dense_topk_for_queries(
        qv, embs.where(~F.col("vec_id").isin(dead)), k=5
    )
    cols = ["query_id", "rank", "doc_id", "cos"]
    assert _rows(got.select(*cols)) == _rows(want.select(*cols))
    assert not {r["doc_id"] for r in got.collect()} & set(dead)


def test_merge_stores_folds_live_source_vectors(spark, sf_med, tmp_path):
    """merge folds the sources' LIVE vectors into the destination under
    its frozen centroids: tombstoned source ids never migrate, the
    merged store equals brute force over the surviving union at
    all-probe, and overlapping sources fail loudly through the
    add_vectors disjointness checks."""
    from partitioned_ef_ans_spark.operators import hybrid as h_mod

    embs = _embs(spark, sf_med)
    dst, src = _build_parity_shards(spark, embs, tmp_path)
    dead = [
        int(r["vec_id"])
        for r in embs.where(F.col("vec_id") % 2 == 1)
        .orderBy("vec_id")
        .limit(2)
        .collect()
    ]
    ann_store.delete_vectors(spark, src, dead)
    man = ann_store.merge_ann_stores(spark, dst, [src], embs)
    n_half0 = embs.where(F.col("vec_id") % 2 == 0).count()
    n_half1 = embs.where(F.col("vec_id") % 2 == 1).count()
    assert man["n_vectors"] == n_half0 + n_half1 - len(dead)
    assert ann_store.verify_ann_index(spark, dst)["ok"]
    qv = _qv(embs)
    idx = ann_store.load_ann_index(spark, dst)
    got = idx.query(qv, embs, k=5, nprobe=8)
    want = h_mod.dense_topk_for_queries(
        qv, embs.where(~F.col("vec_id").isin(dead)), k=5
    )
    cols = ["query_id", "rank", "doc_id", "cos"]
    assert _rows(got.select(*cols)) == _rows(want.select(*cols))
    # a second merge of the same source overlaps -> rejected
    with pytest.raises(ValueError, match="already present"):
        ann_store.merge_ann_stores(spark, dst, [src], embs)
    # payload table missing source rows -> rejected up front
    half = embs.where(F.col("vec_id") % 2 == 0)
    other = str(tmp_path / "other")
    ann_store.build_ann_index(
        spark,
        embs.where(F.col("vec_id") % 2 == 1).withColumn(
            "vec_id", F.col("vec_id") + 1000000
        ),
        other, n_centroids=8, trained=False, sq8=False, engine="np",
    )
    with pytest.raises(ValueError, match="covers"):
        ann_store.merge_ann_stores(spark, dst, [other], half)


def test_sharded_query_dedups_overlapping_shards(spark, sf_med, tmp_path):
    """A merged-but-not-yet-retired source overlaps the destination:
    the same vector reaches the gather from both legs with identical
    per-pair cos.  The fused top-k must dedup (query_id, doc_id)
    before ranking — result equals serving the destination alone."""
    embs = _embs(spark, sf_med)
    dst, src = _build_parity_shards(spark, embs, tmp_path)
    ann_store.merge_ann_stores(spark, dst, [src], embs)
    qv = _qv(embs)
    got = ann_store.query_sharded_ann(spark, [dst, src], qv, embs, k=5,
                                      nprobe=8)
    rows = got.collect()
    pairs = [(r["query_id"], r["doc_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    want = ann_store.load_ann_index(spark, dst).query(
        qv, embs, k=5, nprobe=8
    )
    cols = ["query_id", "rank", "doc_id", "cos"]
    assert _rows(got.select(*cols)) == _rows(want.select(*cols))


def test_neardup_via_store_equals_brute_and_masks_deletes(
    spark, sf_med, store_dir
):
    """Near-dup served from the persisted store (frozen centroids +
    assignments replacing k-means + the argmax pass) must equal the
    brute-force pair relation exactly, and tombstoned vectors must
    pair with nothing — before AND after frozen-model appends."""
    from partitioned_ef_ans_spark.operators import dedup as d_mod

    embs = _embs(spark, sf_med)
    ids = sorted(r["vec_id"] for r in embs.select("vec_id").collect())
    seed = embs.where(F.col("vec_id") <= ids[len(ids) * 4 // 5])
    ann_store.build_ann_index(
        spark, seed, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    # frozen-model append: the bound must stay admissible for vectors
    # assigned to frozen (not retrained) centroids
    ann_store.add_vectors(
        spark, store_dir,
        embs.where(F.col("vec_id") > ids[len(ids) * 4 // 5]), engine="np",
    )
    got = _rows(ann_store.neardup_via_store(spark, store_dir, embs))
    want = _rows(d_mod.embedding_neardup_pairs(embs))
    assert got == want and got
    dead = [int(r["vec_a"]) for r in
            d_mod.embedding_neardup_pairs(embs).limit(2).collect()]
    ann_store.delete_vectors(spark, store_dir, dead)
    got2 = _rows(ann_store.neardup_via_store(spark, store_dir, embs))
    want2 = _rows(d_mod.embedding_neardup_pairs(
        embs.where(~F.col("vec_id").isin(dead))
    ))
    assert got2 == want2
    assert not any(a in dead or b in dead for a, b, _c in got2)


def test_rebuild_crash_preserves_old_store_and_tombstones(
    spark, sf_med, store_dir
):
    """A rebuild that crashes mid-build must leave the OLD store fully
    live — tombstones included (the new generation commits through one
    journaled rename set at the END; retiring the sidecar up front
    would resurrect deleted vectors on exactly this crash), and the
    next locked mutator sweeps the scratch leftovers."""
    import os as _os

    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    dead = [int(r["vec_id"]) for r in embs.orderBy("vec_id").limit(2).collect()]
    ann_store.delete_vectors(spark, store_dir, dead)
    want = _rows(
        ann_store.load_ann_index(spark, store_dir).query(
            _qv(embs), embs, k=5, nprobe=8
        )
    )
    real = ann_store.ann_mod.assign_buckets

    def boom(*a, **k):
        raise RuntimeError("injected rebuild crash")

    ann_store.ann_mod.assign_buckets = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            ann_store.build_ann_index(
                spark, embs, store_dir, n_centroids=8, trained=False,
                sq8=False, engine="np",
            )
    finally:
        ann_store.ann_mod.assign_buckets = real
    # old generation fully intact: sidecar still masks, serving equal
    assert _os.path.exists(f"{store_dir}/tombstones.parquet")
    got = _rows(
        ann_store.load_ann_index(spark, store_dir).query(
            _qv(embs), embs, k=5, nprobe=8
        )
    )
    assert got == want
    assert not any(d in {r[2] for r in got} for d in dead)
    v = ann_store.verify_ann_index(spark, store_dir)
    assert v["ok"], v
    # scratch leftovers from the crashed build are swept by the next
    # locked mutator (repair), and a fresh rebuild then succeeds and
    # retires the sidecar in its commit
    ann_store.repair_ann_index(spark, store_dir)
    assert not [
        n for n in _os.listdir(store_dir) if n.startswith(".rebuild.")
    ]
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    assert not _os.path.exists(f"{store_dir}/tombstones.parquet")
    assert ann_store.verify_ann_index(spark, store_dir)["ok"]


def test_verify_reports_tombstone_pressure(spark, sf_med, store_dir):
    """verify_ann_index reports the sidecar/live ratio and flags
    broadcast-mask growth past TOMBSTONE_PRESSURE_RATIO, pointing at
    compaction; the flag is an advisory, never a failed check."""
    embs = _embs(spark, sf_med)
    ann_store.build_ann_index(
        spark, embs, store_dir, n_centroids=8, trained=False, sq8=False,
        engine="np",
    )
    res = ann_store.verify_ann_index(spark, store_dir)
    assert res["ok"] and res["tombstone_ratio"] == 0.0
    assert "tombstone_pressure" not in res
    ids = [r["vec_id"] for r in embs.select("vec_id").collect()]
    dead = ids[::10]  # ~10% of ids > the 5% threshold
    ann_store.delete_vectors(spark, store_dir, dead)
    res = ann_store.verify_ann_index(spark, store_dir)
    assert res["ok"], res
    assert res["tombstone_ratio"] > ann_store.TOMBSTONE_PRESSURE_RATIO
    assert "compact_ann_index" in res["tombstone_pressure"]
    ann_store.compact_ann_index(spark, store_dir)
    res = ann_store.verify_ann_index(spark, store_dir)
    assert res["ok"] and res["tombstone_ratio"] == 0.0
    assert "tombstone_pressure" not in res


def test_build_rejects_duplicate_vec_ids(spark, sf_med, store_dir):
    """Duplicate input ids would write duplicate assignment/twin rows
    that verify flags forever and repair cannot clear — the build
    rejects them up front, mirroring add_vectors."""
    embs = _embs(spark, sf_med)
    dup = embs.unionByName(embs.limit(3))
    with pytest.raises(ValueError, match="duplicate"):
        ann_store.build_ann_index(
            spark, dup, store_dir, n_centroids=8, trained=False,
            sq8=False, engine="np",
        )
