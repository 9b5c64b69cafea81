"""Similarity search over embedding columns.

- :func:`cosine_topk` — brute-force cosine top-k (the exactness
  baseline; O(n^2) cross join, fine per-partition / small n).
- :func:`ivf_topk` — IVF-style bucketed variant: deterministic
  centroids (the embeddings of the first ``n_centroids`` vec_ids),
  nearest-centroid assignment, probe the ``nprobe`` closest centroid
  buckets only.  The scale path: assignment is a broadcast join
  against centroids; the search join is bucket-colocated instead of
  all-pairs.

Both are pure DataFrame ops (F.zip_with/F.aggregate dot products) and
both have exact DuckDB oracles; the driver gate checks rank-identical
neighbor lists (scores rounded before ranking, ties by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    # cast BEFORE multiplying: float32 products then double accumulation
    # would diverge from the (all-double) DuckDB oracle at round-6
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda s, v: s + v.cast("double") * v.cast("double")
        )
    )


def cosine_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """(vec_id, rank, neighbor, cos): top-k cosine neighbors per vector
    (self excluded), ranked on rounded score with vec_id tie-break."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    scored = (
        a.crossJoin(b)
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor"),
            F.round(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor", "cos")
    )


def auto_n_centroids(
    n: int, max_bucket: int = 1 << 14, lo: int = 8, hi: int = 1 << 16
) -> int:
    """Data-driven centroid count: ~sqrt(n) (the classic IVF sizing,
    giving ~sqrt(n)-sized buckets), raised further if buckets would
    still exceed ``max_bucket`` vectors.  A constant count is a skew
    magnet at scale: a bucket join keyed on 8 values concentrates the
    whole table on 8 reducers.  With sqrt scaling both the number of
    join keys and the per-key payload grow as sqrt(n), so the bucketed
    join stays balanced as the table grows 100x.  Residual hot buckets
    (dense regions) are split statically by the hot-bucket salting in
    ivf_topk / dedup.bucketed_candidate_pairs (``pmod(hash(vec_id),
    nsalt)`` sub-keys, probe side replicated), with AQE skew-join
    splitting (session.py) as the runtime backstop."""
    import math

    if n <= 0:
        return lo
    want = max(math.isqrt(n), -(-n // max_bucket))
    return max(lo, min(hi, want))


def kmeans_centroids(
    embeddings: DataFrame, n_centroids: int | None = None, iters: int = 2
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column:
    init = the first ``n_centroids`` vec_ids, assignment by rounded
    cosine (tie-break by cent_id), update = element-wise mean rounded
    to 6 decimals.  Rounding at every step keeps the iteration
    bit-reproducible ACROSS ENGINES, so the DuckDB oracle can replay
    the exact same clustering; empty clusters drop on both sides.

    Plan shape at scale: per iteration one broadcast join (centroids
    are tiny) + one (cent_id, dim) hash aggregation — no all-pairs
    anything.  Centroids MATERIALIZE to literal rows after every
    update (n_centroids rows — a constant-size driver collect):
    without this, every downstream reference replays the whole
    iteration lineage and the physical plan explodes (measured: 77
    exchanges for the bucketed near-dup vs 8 after)."""

    def _materialize(df: DataFrame) -> DataFrame:
        return df.sparkSession.createDataFrame(df.collect(), df.schema)

    if n_centroids is None:
        n_centroids = auto_n_centroids(embeddings.count())
    # seed with the n smallest ACTUAL vec_ids (not `vec_id < n`): id
    # spaces are not necessarily dense or 0-based (post-dedup tables,
    # offset ids) — the value-filter form would silently yield fewer
    # or zero centroids and empty downstream results.  Same class as
    # the docID-universe-vs-count lesson.
    cent = _materialize(
        embeddings.orderBy("vec_id").limit(n_centroids).select(
            F.col("vec_id").alias("cent_id"),
            F.transform(
                "embedding", lambda x: F.round(x.cast("double"), 6)
            ).alias("cvec"),
        )
    )
    for _ in range(iters):
        sim = embeddings.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "embedding",
            "cent_id",
            F.round(
                _dot(F.col("embedding"), F.col("cvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("cvec"))),
                6,
            ).alias("csim"),
        )
        wassign = Window.partitionBy("vec_id").orderBy(
            F.desc("csim"), F.asc("cent_id")
        )
        assign = (
            sim.withColumn("r", F.row_number().over(wassign))
            .where(F.col("r") == 1)
            .select("cent_id", "embedding")
        )
        dims = assign.select(
            "cent_id", F.posexplode("embedding").alias("pos", "v")
        )
        # the centroid mean sums SCALED INTEGERS, not doubles: a
        # double avg() accumulates in partition order (nondeterministic
        # run-to-run and vs DuckDB), and a mean landing within an ulp
        # of a 0.5e-6 rounding boundary would flip round(·, 6) and
        # diverge the whole iteration.  round(v·1e6) as long is exact,
        # order-free (integer sums < 2^53), and both engines compute
        # the identical value.
        cent = _materialize(
            dims.select(
                "cent_id", "pos",
                F.round(F.col("v").cast("double") * F.lit(1e6))
                .cast("long").alias("vi"),
            )
            .groupBy("cent_id", "pos")
            .agg(
                F.round(
                    F.sum("vi").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(1e6),
                    6,
                ).alias("m")
            )
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
    return cent


def assign_buckets(
    embeddings: DataFrame, centroids: DataFrame, engine: str = "hof"
) -> DataFrame:
    """(vec_id, bucket): nearest-centroid assignment of every corpus
    vector (rounded cosine, cent_id tie-break).  Split out of
    :func:`ivf_topk` so external-query serving can assign the corpus
    ONCE and reuse the assignment across query batches — at 100 TB the
    assignment is a one-off broadcast-join pass you persist alongside
    the embeddings, not per-batch work.

    ``engine="np"`` scores each Arrow batch against the broadcast
    normalized centroid matrix with one numpy matmul instead of the
    interpreted HOF fold per (vector, centroid) pair — the assignment
    pass is corpus x n_centroids dots, the single hottest stage of
    IVF prep (measured 35 s -> ~2 s at 50k x 223 on 8 cores,
    BENCH_ANN.json).  Same rounded-cosine argmax with cent_id
    tie-break; parity locked in tests."""
    if engine == "np":
        return _assign_buckets_np(embeddings, centroids)
    if engine != "hof":
        raise ValueError(f"unknown engine: {engine!r}")
    sim = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "cent_id",
        F.round(
            _dot(F.col("embedding"), F.col("cvec"))
            / (_norm(F.col("embedding")) * _norm(F.col("cvec"))),
            6,
        ).alias("csim"),
    )
    wassign = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), F.asc("cent_id")
    )
    return (
        sim.withColumn("crank", F.row_number().over(wassign))
        .where(F.col("crank") == 1)
        .select("vec_id", F.col("cent_id").alias("bucket"))
    )


def _assign_buckets_np(
    embeddings: DataFrame, centroids: DataFrame
) -> DataFrame:
    """numpy twin of the HOF assignment: centroids (tiny) collect to
    the driver sorted by cent_id, normalize in float64, broadcast; each
    corpus batch computes every cosine with one BLAS matmul, rounds
    half-up to 6 (matching F.round), and argmaxes along the
    cent_id-ascending axis — numpy argmax returns the FIRST max, which
    IS the smallest-cent_id tie-break."""
    import numpy as np

    spark = embeddings.sparkSession
    crows = sorted(
        centroids.select("cent_id", "cvec").collect(),
        key=lambda r: r["cent_id"],
    )
    cids = np.asarray([int(r["cent_id"]) for r in crows], dtype=np.int64)
    cm = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in crows])
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((cids, cm))

    def _assign(batches):
        import numpy as np
        import pandas as pd

        cids_, cm_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = np.floor((emb @ cm_.T) * 1e6 + 0.5)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "bucket": cids_[np.argmax(sims, axis=1)],
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _assign, "vec_id long, bucket long"
    )


def ivf_dense_topk(
    query_vecs: DataFrame,
    embeddings: DataFrame,
    *,
    k: int = 10,
    n_centroids: int | None = None,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
    salt_target: int | None = None,
    salts: DataFrame | None = None,
    quant: str | None = None,
    rescore_mult: int = 3,
    quantized: DataFrame | None = None,
    engine: str = "hof",
    pq_m: int = 8,
    pq_ks: int = 16,
    pq_codebooks_df: DataFrame | None = None,
    pq_codes_df: DataFrame | None = None,
    pq_dim: int | None = None,
) -> DataFrame:
    """IVF-probe dense retrieval for EXTERNAL query vectors:
    ``query_vecs`` is ``(query_id, embedding)``, result is
    ``(query_id, rank, doc_id, cos)`` — the scale twin of
    :func:`..operators.hybrid.dense_topk_for_queries`'s brute-force
    crossJoin (same output shape, recall traded for never touching
    non-probed buckets).

    Plan shape at 100 TB: the corpus is bucket-assigned ONCE (pass
    ``assignments`` from :func:`assign_buckets` — and the matching
    ``salts`` from :func:`..operators.dedup.bucket_salts` — to
    amortize both across query batches); each query joins the
    broadcast centroids to pick
    its ``nprobe`` closest buckets (map-side — queries are the small
    relation); the candidate join is bucket-colocated with hot buckets
    salted exactly like :func:`ivf_topk` (sub-keyed corpus side,
    probe side replicated — every (query, member) pair meets once);
    candidates are distinct'd on the ID PAIR only before the vector
    payload is re-joined for scoring.  No full-corpus crossJoin
    anywhere.  With ``nprobe >= n_centroids`` the candidate set is the
    whole corpus and the result EQUALS the brute-force baseline
    (locked in tests).

    ``quant="sq8"`` inserts the int8 first pass between the candidate
    join and the exact rescore (see :func:`sq8_quantize`): candidates
    are cut to ``k * rescore_mult`` per query on the quantized dot —
    at scale the first pass reads 1/4 the vector bytes and the float
    payload is fetched only for the survivors.  With ``rescore_mult``
    large enough to keep every candidate the result equals the
    unquantized path exactly.  Like ``assignments``/``salts``, a
    persisted corpus ``quantized`` twin (:func:`sq8_quantize` output)
    can be passed in so the first pass reads only the int8 column.

    ``quant="pq"`` uses the product-quantization ADC first pass
    instead (see :func:`pq_ivf_topk`): the corpus side is its m-byte
    code twin, the query side an integer LUT — pass
    ``pq_codebooks_df`` / ``pq_codes_df`` to amortize encoding.

    ``engine="np"`` swaps the per-pair interpreted HOF fold for a
    numpy einsum per Arrow batch (:func:`_np_score_pairs`) on both the
    sq8 prefilter and the exact rescore — same rounded values
    (parity locked in tests), 20x+ on the scoring stage
    (BENCH_ANN.json).  The np prefilter quantizes in-task from the
    float column (``quantized`` is unused there)."""
    if centroids is not None:
        cent = centroids.select("cent_id", "cvec")
    else:
        if n_centroids is None:
            n_centroids = auto_n_centroids(embeddings.count())
        # n smallest actual ids, not a value filter (sparse-id safety)
        cent = embeddings.orderBy("vec_id").limit(n_centroids).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
        )
    if assignments is None:
        assignments = assign_buckets(embeddings, cent)
    qsim = query_vecs.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "cent_id",
        F.round(
            _dot(F.col("embedding"), F.col("cvec"))
            / (_norm(F.col("embedding")) * _norm(F.col("cvec"))),
            6,
        ).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("cent_id")
    )
    probes = (
        qsim.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= int(nprobe))
        .select("query_id", F.col("cent_id").alias("bucket"))
    )
    from partitioned_ef_ans_spark.operators.dedup import (
        BUCKET_SALT_TARGET,
        bucket_salts,
    )

    if salt_target is None:
        salt_target = BUCKET_SALT_TARGET
    # salts are a pure function of the (static) bucket assignment —
    # amortized serving should precompute them ONCE next to
    # assign_buckets and pass them in, or the per-batch call pays a
    # corpus-sized groupBy().count() shuffle just to rebuild them
    if salts is None:
        salts = bucket_salts(assignments.groupBy("bucket").count(), salt_target)
    nsalt = F.broadcast(salts)
    t_s = (
        assignments.join(nsalt, "bucket")
        .withColumn(
            "salt", F.pmod(F.hash("vec_id"), F.col("nsalt")).cast("int")
        )
        .drop("nsalt")
    )
    q_rep = (
        probes.join(nsalt, "bucket")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.col("nsalt") - F.lit(1)))
        )
        .drop("nsalt")
    )
    cand = (
        q_rep.join(t_s, ["bucket", "salt"])
        .select("query_id", F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    if quant not in (None, "sq8", "pq"):
        raise ValueError(f"unknown quant mode: {quant!r}")
    if engine not in ("hof", "np"):
        raise ValueError(f"unknown engine: {engine!r}")
    if quant == "pq":
        # PQ-ADC first pass for external queries: the corpus side is
        # its m-byte code twin (pass pq_codebooks_df/pq_codes_df to
        # amortize encoding), the query side builds an integer LUT per
        # (subspace, codeword); identical semantics to pq_ivf_topk
        cb = (
            pq_codebooks_df
            if pq_codebooks_df is not None
            else pq_codebooks(embeddings, pq_m, pq_ks)
        )
        cds = (
            pq_codes_df
            if pq_codes_df is not None
            else pq_encode(embeddings, cb, pq_m)
        )
        lut = pq_adc_lut(query_vecs, cb, pq_m, id_col="query_id", dim=pq_dim)
        cand = _pq_adc_prefilter(
            cand.select("query_id", F.col("doc_id")),
            lut,
            cds,
            keep=int(k) * int(rescore_mult),
            query_col="query_id",
            target_col="doc_id",
        )
    if engine == "np":
        # vectorized scoring of the candidate join: one numpy einsum
        # per Arrow batch instead of an interpreted HOF fold per pair
        # (measured 20x+ on the pair-scoring stage, BENCH_ANN.json);
        # same rounded values, parity locked in tests
        temb_f = embeddings.select(F.col("vec_id").alias("doc_id"), "embedding")
        # one query-matrix collect for the whole call (the prefilter
        # and the rescore would otherwise each run a driver collect —
        # a per-call Spark job, the CLAUDE.md serving-wrapper rule)
        prep = _np_query_prep(query_vecs)
        if quant == "sq8":
            pre = _np_score_pairs(
                cand.join(temb_f, "doc_id"), query_vecs, quant=True,
                prep=prep,
            )
            wpre = Window.partitionBy("query_id").orderBy(
                F.desc("qdot"), F.asc("doc_id")
            )
            cand = (
                pre.withColumn("prerank", F.row_number().over(wpre))
                .where(F.col("prerank") <= int(k) * int(rescore_mult))
                .select("query_id", "doc_id")
            )
        scored = _np_score_pairs(
            cand.join(temb_f, "doc_id"), query_vecs, quant=False,
            prep=prep,
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select(
                "query_id", F.col("rank").cast("int").alias("rank"),
                "doc_id", "cos",
            )
        )
    if quant == "sq8":
        corpus_q8 = quantized if quantized is not None else sq8_quantize(embeddings)
        cand = _sq8_prefilter(
            cand,
            sq8_quantize(query_vecs, id_col="query_id"),
            corpus_q8.select(F.col("vec_id").alias("doc_id"), "qvec"),
            keep=int(k) * int(rescore_mult),
            query_col="query_id",
            target_col="doc_id",
        )
    return _exact_rescore_topk(
        cand, embeddings, query_vecs, k,
        query_col="query_id", target_col="doc_id",
    )


def _resolve_centroids(
    embeddings: DataFrame,
    n_centroids: int | None,
    centroids: DataFrame | None,
) -> DataFrame:
    """(cent_id, cvec): explicit centroids if given, else the
    embeddings of the ``n_centroids`` smallest ACTUAL vec_ids (not a
    value filter — sparse-id safety, see kmeans_centroids)."""
    if centroids is not None:
        return centroids.select("cent_id", "cvec")
    if n_centroids is None:
        n_centroids = auto_n_centroids(embeddings.count())
    return embeddings.orderBy("vec_id").limit(n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )


def _ivf_candidate_pairs(
    embeddings: DataFrame,
    cent: DataFrame,
    nprobe: int,
    salt_target: int | None,
) -> DataFrame:
    """(vec_id, neighbor) distinct candidate pairs of the IVF
    self-join: nearest-centroid bucket assignment, each vector probes
    its ``nprobe`` closest buckets, hot buckets salted (sub-keyed
    target side, replicated probe side — every pair meets exactly
    once), self-pairs excluded, dedup on the ID PAIR only (vector
    payloads are re-joined by the caller AFTER the distinct so the
    exchange never ships them)."""
    sim = embeddings.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "cent_id",
        F.round(
            _dot(F.col("embedding"), F.col("cvec"))
            / (_norm(F.col("embedding")) * _norm(F.col("cvec"))),
            6,
        ).alias("csim"),
    )
    wassign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    ranked = sim.withColumn("crank", F.row_number().over(wassign))
    assign = ranked.where(F.col("crank") == 1).select(
        "vec_id", F.col("cent_id").alias("bucket")
    )
    probes = ranked.where(F.col("crank") <= nprobe).select(
        "vec_id", F.col("cent_id").alias("bucket")
    )
    # hot-bucket salting (same scheme as dedup.bucketed_candidate_
    # pairs): an oversized bucket splits into hashed sub-keys on the
    # target side; the probe side replicates across that bucket's
    # salts, so every (probe, member) pair still meets exactly once.
    # nsalt==1 for all buckets when nothing exceeds the target.
    from partitioned_ef_ans_spark.operators.dedup import (
        BUCKET_SALT_TARGET,
        bucket_salts,
    )

    if salt_target is None:
        salt_target = BUCKET_SALT_TARGET
    nsalt = F.broadcast(
        bucket_salts(assign.groupBy("bucket").count(), salt_target)
    )
    t_s = (
        assign.join(nsalt, "bucket")
        .withColumn("salt", F.pmod(F.hash("vec_id"), F.col("nsalt")).cast("int"))
        .drop("nsalt")
    )
    q_rep = (
        probes.join(nsalt, "bucket")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.col("nsalt") - F.lit(1)))
        )
        .drop("nsalt")
    )
    # dedup on the ID PAIR only (a pair probed via several shared
    # buckets must score once), then re-join the embeddings: hauling
    # the vector payload through the distinct's exchange would ship
    # dim x 4 bytes per candidate copy for no reason
    return (
        q_rep.alias("q")
        .join(t_s.alias("t"), ["bucket", "salt"])
        .where(F.col("q.vec_id") != F.col("t.vec_id"))
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("t.vec_id").alias("neighbor"),
        )
        .distinct()
    )


def _exact_rescore_topk(
    cand: DataFrame,
    embeddings: DataFrame,
    query_vecs: DataFrame,
    k: int,
    query_col: str = "vec_id",
    target_col: str = "neighbor",
) -> DataFrame:
    """(query_col, rank, target_col, cos): the exact rounded-cosine
    rescore of candidate ID pairs plus the top-k window — the shared
    tail of EVERY IVF serving shape (plain / sq8 / pq, self-join and
    external-query).  The rounding and tie-break discipline the oracle
    hashes (cast-first double dot, round half-up to 6 BEFORE the
    window, ties by target id) lives HERE and nowhere else, so a fix
    to it cannot silently miss one variant."""
    temb = embeddings.select(
        F.col("vec_id").alias(target_col), F.col("embedding").alias("temb")
    )
    qemb = query_vecs.select(
        F.col(query_col), F.col("embedding").alias("qemb")
    )
    scored = cand.join(temb, target_col).join(qemb, query_col).select(
        query_col,
        target_col,
        F.round(
            _dot(F.col("qemb"), F.col("temb"))
            / (_norm(F.col("qemb")) * _norm(F.col("temb"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("cos"), F.asc(target_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            query_col, F.col("rank").cast("int").alias("rank"),
            target_col, "cos",
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    salt_target: int | None = None,
) -> DataFrame:
    """IVF-bucketed cosine top-k.

    Default centroids are the embeddings of the n_centroids smallest
    vec_ids (deterministic); pass ``centroids`` (cent_id, cvec) — e.g. from
    :func:`kmeans_centroids` — for trained buckets.  Each vector joins
    its nearest centroid's bucket; each query probes its ``nprobe``
    closest centroids.  Output shape == cosine_topk (fewer/different
    neighbors possible — that's the recall tradeoff, measured in tests
    against the brute-force baseline).
    """
    cent = _resolve_centroids(embeddings, n_centroids, centroids)
    cand = _ivf_candidate_pairs(embeddings, cent, nprobe, salt_target)
    return _exact_rescore_topk(cand, embeddings, embeddings, k)


# --------------------------------------------- scalar quantization (SQ8)

def sq8_quantize(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """``(id_col, qvec)``: signed-int8 scalar quantization of the
    L2-NORMALIZED vector — ``q[i] = floor(127 * v[i]/||v|| + 0.5)``,
    every component in [-127, 127].

    Why this shape: at 100 TB the embedding column dominates scan
    bytes (float32 x dim per row); the int8 twin is exactly 1/4 the
    payload, and because the vectors are normalized BEFORE quantizing,
    the integer dot product ``sum(qa[i]*qb[i]) ~= 127^2 * cosine`` is
    a monotone-enough proxy to PREFILTER candidates, with the exact
    float rescore touching only the survivors (the classic IVF+SQ
    recipe).  In a production layout ``qvec`` persists byte-packed
    next to the embeddings and is the only column the first pass
    reads.

    Determinism across engines: the whole expression is IEEE double
    (cast-first, same op order) and ``floor(x + 0.5)`` rounds
    identically in Spark and DuckDB (no round-half-even ambiguity), so
    the oracle reproduces every component exactly.  Zero vectors are
    undefined here, as in every cosine path in this module."""
    withn = embeddings.select(
        F.col(id_col), "embedding", _norm(F.col("embedding")).alias("nn")
    )
    return withn.select(
        F.col(id_col),
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") / F.col("nn") * F.lit(127.0) + F.lit(0.5)
            ).cast("long"),
        ).alias("qvec"),
    )


def _qdot(a, b):
    # exact integer dot product (|q| <= 127, so component products and
    # any realistic-dimension sum fit comfortably in a long)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _sq8_prefilter(
    cand: DataFrame,
    q_quant: DataFrame,
    t_quant: DataFrame,
    keep: int,
    query_col: str = "vec_id",
    target_col: str = "neighbor",
) -> DataFrame:
    """Cut ``cand`` (query_col, target_col) to the top-``keep`` rows
    per query by quantized integer dot (ties by target id — integer
    scores tie freely and the cut must be engine-identical).
    ``q_quant``/``t_quant`` are :func:`sq8_quantize` outputs keyed by
    ``query_col``/``target_col`` (the same frame twice for the
    self-join case).  Only the int8 payload crosses this join; the
    float vectors are joined by the caller for the exact rescore of
    the survivors."""
    qa = q_quant.select(F.col(query_col), F.col("qvec").alias("qa"))
    qb = t_quant.select(F.col(target_col), F.col("qvec").alias("qb"))
    pre = cand.join(qb, target_col).join(qa, query_col).select(
        query_col, target_col, _qdot(F.col("qa"), F.col("qb")).alias("qdot")
    )
    wpre = Window.partitionBy(query_col).orderBy(
        F.desc("qdot"), F.asc(target_col)
    )
    return (
        pre.withColumn("prerank", F.row_number().over(wpre))
        .where(F.col("prerank") <= int(keep))
        .select(query_col, target_col)
    )


def sq8_ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    salt_target: int | None = None,
    rescore_mult: int = 3,
    quantized: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k with an int8 first pass: same buckets/probes/salting
    as :func:`ivf_topk`, but the candidate pairs are first scored on
    the quantized vectors (1/4 the bytes) and only the top
    ``k * rescore_mult`` per query are rescored with the exact float
    cosine.  Output shape == :func:`ivf_topk`; with ``rescore_mult``
    large enough to keep every candidate the result EQUALS ivf_topk
    exactly (locked in tests).  The recall knob is ``rescore_mult``:
    the int8 dot on normalized vectors tracks true cosine to ~1%, so
    small multiples already recover the exact bucketed top-k on real
    data (measured in tests/test_sq8.py).

    Pass ``quantized`` (a persisted :func:`sq8_quantize` output) to
    skip re-deriving the int8 twin from the float column — at scale
    the quantized table lives next to the embeddings and the first
    pass never touches the float payload."""
    cent = _resolve_centroids(embeddings, n_centroids, centroids)
    cand = _ivf_candidate_pairs(embeddings, cent, nprobe, salt_target)
    q8 = quantized if quantized is not None else sq8_quantize(embeddings)
    kept = _sq8_prefilter(
        cand,
        q8,
        q8.select(F.col("vec_id").alias("neighbor"), "qvec"),
        keep=int(k) * int(rescore_mult),
    )
    return _exact_rescore_topk(kept, embeddings, embeddings, k)


def dense_topk_np(
    query_vecs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    quant: str | None = None,
    rescore_mult: int = 4,
) -> DataFrame:
    """Vectorized brute-force dense retrieval: the PRODUCTION twin of
    :func:`..operators.hybrid.dense_topk_for_queries` (same contract:
    ``(query_id, rank, doc_id, cos)`` top-k by rounded cosine, doc_id
    tie-break) built as one Arrow-batched ``mapInPandas`` pass over
    the corpus instead of a row-exploding crossJoin + interpreted-HOF
    fold:

    * the query matrix (Q x dim, L2-normalized float64) broadcasts to
      every task — queries are the small relation;
    * each corpus batch scores ALL queries with one numpy matmul
      (BLAS) and emits only its LOCAL top-k per query by
      (rounded cos DESC, doc_id ASC) — the per-(partition, query)
      partial top-k makes the exchanged rows O(Q * k * n_batches),
      never O(Q * corpus);
    * a final window keeps the global top-k (top-k of a union of
      per-batch top-ks under one total order IS the global top-k).

    Scores are rounded to 6 decimals BEFORE every selection with
    ``floor(x*1e6 + 0.5)/1e6`` (half-up, matching F.round / DuckDB;
    numpy's own ``round`` is half-even and would diverge), so ranked
    output is engine-identical to the HOF path (parity locked in
    tests).

    ``quant="sq8"`` adds the int8 first pass INSIDE the batch: the
    normalized batch quantizes exactly like :func:`sq8_quantize`, the
    approximate scores come from a float32 matmul of the quantized
    matrices (every partial sum is an integer <= dim * 127^2 — exact
    in f32 up to ~1000 dims), and only the top ``k * rescore_mult``
    batch-local candidates per query get the exact float64 rescore.
    At scale the quantized corpus twin is the only column the first
    pass needs — 1/4 the scan bytes."""
    import numpy as np

    out_schema = "query_id long, rank int, doc_id long, cos double"
    if quant not in (None, "sq8"):
        raise ValueError(f"unknown quant mode: {quant!r}")
    spark = embeddings.sparkSession
    qrows = query_vecs.select("query_id", "embedding").collect()
    if not qrows:
        return spark.createDataFrame([], out_schema)
    qids = np.asarray([r["query_id"] for r in qrows], dtype=np.int64)
    qm = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in qrows]
    )
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    if quant == "sq8" and qm.shape[1] > 1000:
        raise ValueError(
            "sq8 f32 accumulation is exact only up to ~1000 dims"
        )
    qq = np.floor(qm * 127.0 + 0.5).astype(np.float32) if quant == "sq8" else None
    kk, mult = int(k), int(rescore_mult)
    bc = spark.sparkContext.broadcast((qids, qm, qq))

    def _score_partition(batches):
        import numpy as np
        import pandas as pd

        qids_, qm_, qq_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            docs = pdf["vec_id"].to_numpy(dtype=np.int64)
            emb = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            out_q, out_d, out_c = [], [], []
            if qq_ is not None:
                eq = np.floor(emb * 127.0 + 0.5).astype(np.float32)
                approx = qq_ @ eq.T
                keep = min(kk * mult, docs.size)
                for qi in range(qids_.size):
                    cut = np.lexsort((docs, -approx[qi]))[:keep]
                    sims = emb[cut] @ qm_[qi]
                    r = np.floor(sims * 1e6 + 0.5) / 1e6
                    o = np.lexsort((docs[cut], -r))[:kk]
                    out_q.append(np.full(o.size, qids_[qi], dtype=np.int64))
                    out_d.append(docs[cut][o])
                    out_c.append(r[o])
            else:
                sims = qm_ @ emb.T
                r = np.floor(sims * 1e6 + 0.5) / 1e6
                for qi in range(qids_.size):
                    o = np.lexsort((docs, -r[qi]))[:kk]
                    out_q.append(np.full(o.size, qids_[qi], dtype=np.int64))
                    out_d.append(docs[o])
                    out_c.append(r[qi][o])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "cos": np.concatenate(out_c),
                }
            )

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        _score_partition, "query_id long, doc_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"),
            "doc_id", "cos",
        )
    )


def _np_query_prep(query_vecs: DataFrame) -> tuple:
    """Collect + L2-normalize the query matrix (float64) ONCE per
    serving call: the quantized prefilter and the exact rescore both
    derive from it (the int8 floor is applied at use), so a
    prefilter+rescore plan pays one driver collect, not two."""
    import numpy as np

    qrows = query_vecs.select("query_id", "embedding").collect()
    qids = [int(r["query_id"]) for r in qrows]
    qm = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in qrows]
    )
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    return {q: i for i, q in enumerate(qids)}, qm


def _np_score_pairs(
    pairs: DataFrame,
    query_vecs: DataFrame,
    quant: bool,
    query_col: str = "query_id",
    target_col: str = "doc_id",
    prep: tuple | None = None,
) -> DataFrame:
    """Score candidate ``(query_col, target_col, embedding)`` rows
    against the broadcast normalized query matrix with one numpy pass
    per Arrow batch — the vectorized twin of the interpreted per-row
    HOF fold.  Quantized dots are exact integers (order-free);
    float cosines agree with the HOF fold on every gate/test corpus,
    but BLAS reductions may ASSOCIATE double sums differently than the
    sequential fold, so a cosine sitting within 1 ulp of a round-6
    boundary could in principle round differently between engines —
    the oracle hashes (which run the np path end-to-end) are the guard
    that this stays unobserved, and persisted stores freeze ONE
    engine's assignments so serving is always self-consistent.

    quant=False -> (query_col, target_col, cos double), cos rounded
    half-up to 6 like every cosine in this module.
    quant=True  -> (query_col, target_col, qdot long), the exact
    integer dot of the sq8-quantized normalized vectors (in-task
    quantization, identical to :func:`sq8_quantize`).

    Pass ``prep`` (a :func:`_np_query_prep` result) to amortize the
    query-matrix collect across a prefilter+rescore pair."""
    import numpy as np

    spark = pairs.sparkSession
    idx, qm = prep if prep is not None else _np_query_prep(query_vecs)
    if quant:
        qm = np.floor(qm * 127.0 + 0.5)
    bc = spark.sparkContext.broadcast((idx, qm))
    out_field = "qdot long" if quant else "cos double"
    schema = f"{query_col} long, {target_col} long, {out_field}"

    def _score(batches):
        import numpy as np
        import pandas as pd

        idx_, m = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            qi = np.fromiter(
                (idx_[int(q)] for q in pdf[query_col]), np.int64, len(pdf)
            )
            if quant:
                eq = np.floor(emb * 127.0 + 0.5)
                vals = np.einsum("ij,ij->i", m[qi], eq).astype(np.int64)
                col = "qdot"
            else:
                s = np.einsum("ij,ij->i", m[qi], emb)
                vals = np.floor(s * 1e6 + 0.5) / 1e6
                col = "cos"
            yield pd.DataFrame(
                {
                    query_col: pdf[query_col].to_numpy(dtype=np.int64),
                    target_col: pdf[target_col].to_numpy(dtype=np.int64),
                    col: vals,
                }
            )

    return pairs.select(query_col, target_col, "embedding").mapInPandas(
        _score, schema
    )


# ------------------------------------------- product quantization (PQ)

def _pq_dim(embeddings: DataFrame) -> int:
    row = embeddings.select("embedding").first()
    if row is None:
        raise ValueError("empty embeddings table")
    return len(row["embedding"])


def _norm_subvectors(embeddings: DataFrame, m: int, d: int) -> DataFrame:
    """(vec_id, s, vsub): the m contiguous d-dim slices of the
    L2-normalized vector — the shared front half of PQ encoding and
    ADC table building."""
    withn = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nn")
    )
    nv = withn.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("nn")
        ).alias("nv"),
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice("nv", s * d + 1, d).alias("vsub"),
            )
            for s in range(m)
        ]
    )
    return nv.select("vec_id", F.explode(slices).alias("e")).select(
        "vec_id", F.col("e.s").alias("s"), F.col("e.vsub").alias("vsub")
    )


def pq_codebooks(
    embeddings: DataFrame, m: int = 8, ks: int = 16
) -> DataFrame:
    """(s, code_id, csub): deterministic per-subspace codebooks — the
    d-dim slices of the normalized vectors of the ``ks`` smallest
    ACTUAL vec_ids (the pinned-centroid pattern: reproducible on both
    engines with no training loop; swap in trained codebooks the same
    way trained k-means centroids slot into IVF)."""
    dim = _pq_dim(embeddings)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    src = embeddings.orderBy("vec_id").limit(ks)
    return _norm_subvectors(src, m, dim // m).select(
        "s", F.col("vec_id").alias("code_id"), F.col("vsub").alias("csub")
    )


def pq_codebooks_trained(
    embeddings: DataFrame, m: int = 8, ks: int = 16, iters: int = 2
) -> DataFrame:
    """(s, code_id, csub): Lloyd-trained per-subspace codebooks — the
    PQ analogue of :func:`kmeans_centroids`, run over ALL m subspaces
    in one DataFrame (keyed by ``s``) so training is m-way parallel
    with no per-subspace jobs.  Init = the pinned codebooks rounded to
    6; assignment = round-6 squared-L2 argmin with code_id tie-break
    (the same cut :func:`pq_encode` uses); update = element-wise mean
    via SCALED-INTEGER sums rounded to 6 (order-free, identical on
    both engines — the kmeans_centroids trick).  Empty codewords drop
    on both sides.  Codebooks materialize to literal rows every
    iteration (<= m*ks rows) so downstream plans don't replay the
    training lineage."""
    dim = _pq_dim(embeddings)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    subs = _norm_subvectors(embeddings, m, d)

    def _materialize(df: DataFrame) -> DataFrame:
        return df.sparkSession.createDataFrame(df.collect(), df.schema)

    cb = _materialize(
        pq_codebooks(embeddings, m, ks).select(
            "s",
            "code_id",
            F.transform("csub", lambda x: F.round(x, 6)).alias("csub"),
        )
    )
    dist = F.round(
        F.aggregate(
            F.zip_with("vsub", "csub", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    wassign = Window.partitionBy("vec_id", "s").orderBy(
        F.asc("dist"), F.asc("code_id")
    )
    for _ in range(iters):
        j = subs.join(F.broadcast(cb), "s").select(
            "vec_id", "s", "code_id", "vsub", dist.alias("dist")
        )
        assign = (
            j.withColumn("rn", F.row_number().over(wassign))
            .where(F.col("rn") == 1)
            .select("s", "code_id", "vsub")
        )
        dims = assign.select(
            "s", "code_id", F.posexplode("vsub").alias("pos", "v")
        )
        cb = _materialize(
            dims.select(
                "s", "code_id", "pos",
                F.round(F.col("v").cast("double") * F.lit(1e6))
                .cast("long").alias("vi"),
            )
            .groupBy("s", "code_id", "pos")
            .agg(
                F.round(
                    F.sum("vi").cast("double")
                    / F.count(F.lit(1))
                    / F.lit(1e6),
                    6,
                ).alias("mu")
            )
            .groupBy("s", "code_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda st: st["mu"],
                ).alias("csub")
            )
        )
    return cb


def pq_encode(
    embeddings: DataFrame, codebooks: DataFrame, m: int = 8
) -> DataFrame:
    """(vec_id, s, code): nearest-codeword assignment of every
    subvector — squared-L2 on the normalized slices, rounded to 6
    BEFORE the argmin (engine-identical cut), ties to the smallest
    code_id.  The PQ code is m small ints per vector (m bytes with
    ks<=256) vs 4*dim bytes of float — a 32x-compressed corpus twin at
    dim=64/m=8 that the ADC first pass reads INSTEAD of the float
    column."""
    dim = _pq_dim(embeddings)
    subs = _norm_subvectors(embeddings, m, dim // m)
    dist = F.round(
        F.aggregate(
            F.zip_with("vsub", "csub", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    j = subs.join(F.broadcast(codebooks), "s").select(
        "vec_id", "s", "code_id", dist.alias("dist")
    )
    w = Window.partitionBy("vec_id", "s").orderBy(
        F.asc("dist"), F.asc("code_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "s", F.col("code_id").alias("code"))
    )


def pq_adc_lut(
    query_vecs: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """(id_col, s, code_id, lut_i): the ADC lookup table — the dot of
    every query subvector with every codeword, SCALED TO AN INTEGER
    (round(dot * 1e6) as long).  The integer form is the point: the
    per-pair ADC score is a SUM over m LUT rows in a hash aggregate,
    and a float sum there would accumulate in partition order
    (nondeterministic run-to-run and vs DuckDB); integer sums are
    order-free and both engines compute identical values — the same
    trick as the k-means centroid means.

    Pass ``dim`` on serving paths: deriving it costs a ``.first()``
    Spark job per call, and the CLAUDE.md serving-wrapper rule is to
    collect per-index scalars once (AnnIndex passes its manifest
    dim)."""
    if dim is None:
        dim = _pq_dim(
            query_vecs.select(F.col(id_col).alias("vec_id"), "embedding")
        )
    subs = _norm_subvectors(
        query_vecs.select(F.col(id_col).alias("vec_id"), "embedding"),
        m,
        dim // m,
    )
    lut = F.round(
        F.aggregate(
            F.zip_with("vsub", "csub", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        * F.lit(1e6)
    ).cast("long")
    return subs.join(F.broadcast(codebooks), "s").select(
        F.col("vec_id").alias(id_col), "s", "code_id", lut.alias("lut_i")
    )


def _pq_adc_prefilter(
    cand: DataFrame,
    lut: DataFrame,
    codes: DataFrame,
    keep: int,
    query_col: str = "vec_id",
    target_col: str = "neighbor",
) -> DataFrame:
    """Cut ``cand`` (query_col, target_col) to the top-``keep`` per
    query by the integer ADC score: join the target's m codes, join
    the query's LUT rows on (s, code), SUM the integer LUT hits
    (order-free), window cut with target-id tie-break."""
    tcodes = codes.select(
        F.col("vec_id").alias(target_col), "s", F.col("code").alias("code_id")
    )
    adc = (
        cand.join(tcodes, target_col)
        .join(lut, [query_col, "s", "code_id"])
        .groupBy(query_col, target_col)
        .agg(F.sum("lut_i").alias("adc"))
    )
    wpre = Window.partitionBy(query_col).orderBy(
        F.desc("adc"), F.asc(target_col)
    )
    return (
        adc.withColumn("prerank", F.row_number().over(wpre))
        .where(F.col("prerank") <= int(keep))
        .select(query_col, target_col)
    )


def pq_ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    salt_target: int | None = None,
    m: int = 8,
    ks: int = 16,
    rescore_mult: int = 3,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k with a product-quantization ADC first pass: same
    buckets/probes/salting as :func:`ivf_topk`; candidate pairs are
    scored by asymmetric distance computation — the query side builds
    an integer LUT per (subspace, codeword), the target side is its
    m-byte PQ code, approx = order-free integer sum of m LUT hits —
    then only the top ``k * rescore_mult`` per query get the exact
    float cosine.  Like ``sq8_ivf_topk`` but with a 32x (not 4x)
    compressed first-pass corpus twin; pass persisted ``codebooks`` /
    ``codes`` to amortize encoding across batches.  Every stage is
    engine-deterministic (rounded-before-argmin codes, integer ADC),
    so the whole pipeline is DuckDB-oracle-hashable."""
    cent = _resolve_centroids(embeddings, n_centroids, centroids)
    cand = _ivf_candidate_pairs(embeddings, cent, nprobe, salt_target)
    cb = codebooks if codebooks is not None else pq_codebooks(embeddings, m, ks)
    cds = codes if codes is not None else pq_encode(embeddings, cb, m)
    lut = pq_adc_lut(embeddings, cb, m)
    kept = _pq_adc_prefilter(
        cand, lut, cds, keep=int(k) * int(rescore_mult)
    )
    return _exact_rescore_topk(kept, embeddings, embeddings, k)
