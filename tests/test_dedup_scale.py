"""Scale-shape regression tests for the dedup / text-analysis plane.

1. LSH verification must be candidate-only: the exact-Jaccard join is
   pruned by the candidate PAIR set BEFORE the (doc_a, doc_b)
   aggregation (VERDICT r1 item 3 — the all-pairs verify was the
   scale-killer), checked on the optimized logical plan.
2. Fingerprint must be overflow-free on long documents (the int64 sum
   wrapped past ~4k tokens while DuckDB summed in HUGEINT).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from partitioned_ef_ans_spark.operators import dedup as d_mod


def _boilerplate_docs(spark, n_dup=6, n_noise=4):
    """Docs sharing a big boilerplate prefix (every pair co-occurs in
    many shingle buckets) plus unrelated noise docs."""
    boiler = " ".join(f"common{i}" for i in range(40))
    rows = [(i, boiler + f" tail{i} end{i}") for i in range(n_dup)]
    rows += [
        (100 + j, " ".join(f"noise{j}w{k}" for k in range(30)))
        for j in range(n_noise)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_verify_is_candidate_only_plan(spark):
    docs = _boilerplate_docs(spark)
    pairs = d_mod.minhash_lsh_pairs(docs)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    # the exact-Jaccard pair aggregation must sit ABOVE a LeftSemi
    # prune by the candidate pair set (children print after parents)
    agg_at = plan.find("Aggregate [doc_a")
    semi_at = plan.find("LeftSemi")
    assert agg_at != -1 and semi_at != -1
    assert semi_at > agg_at, (
        "candidate semi-join must be below the pair aggregation "
        "(verify restricted to LSH candidates before the groupBy)"
    )


def test_lsh_pairs_match_exact_oracle_on_boilerplate(spark):
    docs = _boilerplate_docs(spark)
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in d_mod.minhash_lsh_pairs(docs).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in d_mod.ngram_jaccard_pairs(docs).collect()
    }
    # the boilerplate family is deliberately near-identical, so LSH
    # with 8 hashes / 4 bands must recall all of its exact pairs
    assert lsh, "boilerplate fixture produced no LSH pairs"
    for pair, j in lsh.items():
        assert exact[pair] == j
    dup_exact = {p for p in exact if p[0] < 100 and p[1] < 100}
    assert dup_exact <= set(lsh)


def test_fingerprint_overflow_free_on_long_doc(spark):
    n_tokens = 5000  # far past the old int64-sum wrap point (~4k)
    toks = [f"w{i % 97}" for i in range(n_tokens)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    from partitioned_ef_ans_spark.functions.text import fingerprint

    got = fingerprint(docs).collect()[0]["fp"]
    expect = 0
    for pos, t in enumerate(toks):
        h = int(hashlib.md5(f"{t}:{pos}".encode()).hexdigest()[:13], 16)
        expect ^= h
    assert got == expect
    assert 0 <= got < (1 << 52)


def test_bucketed_neardup_exact_and_pruning(spark):
    """The k-means-bucketed threshold join must (a) return EXACTLY the
    brute-force pairs, (b) actually prune bucket pairs on clustered
    data (else it is a cross join in disguise)."""
    import numpy as np

    from partitioned_ef_ans_spark.operators.dedup import (
        embedding_neardup_bucketed,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(31)
    rows = []
    vid = 0
    for c in range(4):  # 4 well-separated clusters
        center = rng.normal(size=16)
        center /= np.linalg.norm(center)
        for _ in range(25):
            v = center + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in embedding_neardup_pairs(emb, threshold=0.8).collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in embedding_neardup_bucketed(emb, threshold=0.8).collect()
    }
    assert bucketed == exact
    assert len(exact) > 0


def test_bucketed_neardup_plan_is_bounded(spark):
    """Centroid materialization must keep the physical plan sane: no
    CartesianProduct anywhere, and a bounded number of shuffles
    (lineage replay of the k-means iterations once exploded this to
    77 exchanges)."""
    from partitioned_ef_ans_spark.operators.dedup import embedding_neardup_bucketed
    from partitioned_ef_ans_spark.plans.inspect import count_exchanges, formatted_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = embedding_neardup_bucketed(emb)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) <= 25


def test_auto_n_centroids_scales_with_n():
    """Centroid count must grow with the table (sqrt law + bucket-size
    cap), never sit at a constant that turns the bucket join into an
    8-reducer hotspot."""
    from partitioned_ef_ans_spark.operators.ann import auto_n_centroids

    assert auto_n_centroids(0) == 8
    assert auto_n_centroids(100) == 10
    assert auto_n_centroids(10_000) == 100
    assert auto_n_centroids(1_000_000) == 1000
    # bucket-size cap dominates at extreme n: 10^10 vectors / 2^14
    # target bucket > sqrt(10^10)
    assert auto_n_centroids(10**10) == min(1 << 16, -(-10**10 // (1 << 14)))
    ns = [auto_n_centroids(10**e) for e in range(2, 11)]
    assert ns == sorted(ns)


def test_bucketed_candidates_far_below_n_squared(spark):
    """n >= 10^4 clustered vectors: the data-driven bucketed near-dup
    candidate count must be a tiny fraction of n^2/2 (the brute-force
    pair count) — the scale claim, measured, not asserted in prose."""
    import numpy as np

    from partitioned_ef_ans_spark.operators.dedup import bucketed_candidate_pairs

    rng = np.random.default_rng(7)
    n_clusters, per_cluster, dim = 50, 200, 8
    n = n_clusters * per_cluster  # 10_000
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # interleave clusters (vec i ~ cluster i % n_clusters): the
    # deterministic k-means init takes the FIRST sqrt(n) vec_ids, which
    # must see diverse seeds like a shuffled real table would
    vecs = centers[np.arange(n) % n_clusters] + rng.normal(
        scale=0.02, size=(n, dim)
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cand = bucketed_candidate_pairs(emb, threshold=0.9).count()
    assert cand > 0
    assert cand < (n * (n - 1) // 2) * 0.05, (
        f"{cand} candidate pairs is not 'far below' n^2/2 = {n*(n-1)//2}"
    )


def test_ivf_candidate_dedup_carries_no_vectors(spark):
    """ivf_topk's candidate distinct must key on the id PAIR only —
    hauling the embedding array through that exchange would ship the
    vector payload once per duplicate candidate at scale."""
    from partitioned_ef_ans_spark.operators.ann import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = ivf_topk(emb, k=5, n_centroids=8)._jdf.queryExecution().optimizedPlan().toString()
    # the distinct optimizes to a grouping Aggregate on the id pair
    dedup_lines = [
        l for l in plan.splitlines()
        if "Aggregate [vec_id" in l or "Deduplicate" in l
    ]
    assert dedup_lines, f"expected the candidate distinct in the plan:\n{plan}"
    for l in dedup_lines:
        assert "emb" not in l, f"vector column inside the dedup keys: {l}"


def test_repetition_signals_edges_and_values(spark):
    from partitioned_ef_ans_spark.functions.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (0, "a a a a"),          # all dup: dup_token 0.75, top 1.0, bigrams all equal
            (1, "a b c d"),          # no dup
            (2, "one"),              # single token: bigram frac 0
            (3, ""),                 # empty doc
            (4, "x y x y x y"),      # alternating
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert rows[0]["dup_token_frac"] == 0.75
    assert rows[0]["top_token_frac"] == 1.0
    assert rows[0]["dup_bigram_frac"] == round(2 / 3, 6)
    assert rows[1]["dup_token_frac"] == 0.0
    assert rows[2]["dup_bigram_frac"] == 0.0 and rows[2]["n_tokens"] == 1
    assert rows[3]["n_tokens"] == 0 and rows[3]["top_token_frac"] == 0.0
    assert rows[4]["dup_token_frac"] == round(4 / 6, 6)
    assert rows[4]["dup_bigram_frac"] == 0.6  # 5 bigrams, 2 distinct


def test_hot_bucket_salting_exact_and_keyed(spark):
    """The near-dup-heavy skew case — ONE cluster holding 50% of the
    vectors: salting must keep the bucketed join EXACT (every pair of
    a split bucket still meets exactly once) and must actually key the
    join on (bucket, salt)."""
    import numpy as np

    from partitioned_ef_ans_spark.operators.dedup import (
        bucket_salts,
        embedding_neardup_bucketed,
        embedding_neardup_pairs,
    )
    from partitioned_ef_ans_spark.plans.inspect import formatted_plan

    rng = np.random.default_rng(5)
    rows, vid = [], 0
    hot = rng.normal(size=12)
    hot /= np.linalg.norm(hot)
    for _ in range(100):  # 50% of all vectors, one tight cluster
        v = hot + rng.normal(scale=0.01, size=12)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    for c in range(5):
        center = rng.normal(size=12)
        center /= np.linalg.norm(center)
        for _ in range(20):
            v = center + rng.normal(scale=0.05, size=12)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in embedding_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert len(exact) > 1000  # the hot cluster is genuinely dense
    df = embedding_neardup_bucketed(emb, threshold=0.9, salt_target=25)
    salted = {(r["vec_a"], r["vec_b"], r["cos"]) for r in df.collect()}
    assert salted == exact
    # the candidate join must be keyed on (bucket, salt), not bucket
    assert "salt" in formatted_plan(df)

    # bucket_salts arithmetic: a 100-row bucket at target 25 -> 4 salts
    counts = spark.createDataFrame(
        [(0, 100), (1, 20)], "bucket long, count long"
    )
    ns = {r["bucket"]: r["nsalt"] for r in bucket_salts(counts, 25).collect()}
    assert ns == {0: 4, 1: 1}

    # and the hash split spreads a hot bucket's rows near-evenly: no
    # (bucket, salt) sub-key may keep a super-majority of the rows
    ids = spark.range(100).select(
        F.pmod(F.hash("id"), F.lit(4)).alias("salt")
    )
    per_key = [r["c"] for r in ids.groupBy("salt").agg(F.count("*").alias("c")).collect()]
    assert len(per_key) == 4 and max(per_key) <= 2 * 25
