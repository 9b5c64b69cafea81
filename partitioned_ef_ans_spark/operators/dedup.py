"""Deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame ops (JVM-side; deterministic
md5-prefix hashing shared with the DuckDB oracles):

- exact:     sha-grouped canonical assignment (one shuffle on the hash)
- MinHash+LSH: word-shingles -> k minhashes -> banded signatures ->
  bucket self-join -> exact-Jaccard verification of candidates
- SimHash:   sign-aggregated 60-bit fingerprints (hamming-based near-dup)
- n-gram Jaccard: shared-shingle join (the exact baseline / verifier)
- embedding near-dup: cosine >= threshold pairs over the embeddings

Scale notes: LSH bucket join keys are (band, signature) — cardinality
~docs x bands, never all-pairs; the exact-Jaccard verify only touches
LSH candidates.  Skewed buckets (boilerplate shingles) are bounded by
banding; AQE skew-join covers the rest.  The all-pairs shingle join in
``ngram_jaccard_pairs`` is the small-scale oracle tool, not the scale
path — at 100 TB only the LSH candidates get verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from partitioned_ef_ans_spark.functions.text import md5_long
from partitioned_ef_ans_spark.tokenizer import tokens_array

NUM_HASHES = 8
BANDS = 4  # rows per band = NUM_HASHES // BANDS = 2
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 60


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_doc_id): canonical = min doc_id sharing
    sha256(text).  Equality on content hash == the reference's per-row
    sha256 invariant applied to dedup."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256))
    return documents.select(
        "doc_id", F.min("doc_id").over(w).alias("canonical_doc_id")
    )


def shingles(documents: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) distinct word-k-grams; docs with <k tokens drop."""
    toks = tokens_array(F.col(text_col))
    df = documents.select("doc_id", toks.alias("w")).where(F.size("w") >= k)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("w") - k),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, k)),
    )
    return df.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def minhash_signatures(sh: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): one aggregation, k min columns."""
    aggs = [
        F.min(md5_long(F.concat_ws(":", F.lit(str(i)), F.col("shingle")))).alias(
            f"mh_{i}"
        )
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _jaccard_pairs(sh: DataFrame, candidates: DataFrame | None) -> DataFrame:
    """Exact Jaccard for (doc_a, doc_b) pairs via shared-shingle join.

    When ``candidates`` is given, the verification plan only ever
    touches candidate rows: the shingle table is semi-joined down to
    candidate doc ids BEFORE the self-join, and the candidate PAIR set
    prunes the pair stream BEFORE the (doc_a, doc_b) aggregation — so
    the cost is O(candidate pairs x shared shingles), never the
    all-pairs quadratic blowup LSH exists to avoid.  (candidates=None
    is the small-scale exact oracle path.)
    """
    if candidates is not None:
        cand_docs = (
            candidates.select(F.col("doc_a").alias("doc_id"))
            .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    pair_stream = a.join(b, "shingle").where(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pair_stream = pair_stream.join(candidates, ["doc_a", "doc_b"], "left_semi")
    inter = pair_stream.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """LSH candidate generation + exact verification:
    (doc_a, doc_b, jaccard) with jaccard >= threshold."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide into bands ({bands}) "
            "evenly — trailing minhashes would be computed but never "
            "banded (paying for recall the join never gets)"
        )
    sh = shingles(documents, text_col)
    sig = minhash_signatures(sh, num_hashes)
    rows_per_band = num_hashes // bands
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_rows.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws(":", *[c.cast("string") for c in cols]).alias("sig"),
            )
        )
    buckets = band_rows[0]
    for br in band_rows[1:]:
        buckets = buckets.unionByName(br)
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "sig"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    pairs = _jaccard_pairs(sh, cand)
    return pairs.where(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    documents: DataFrame, text_col: str = "text", threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact all-candidate Jaccard pairs (the LSH verifier's ground
    truth): (doc_a, doc_b, jaccard >= threshold)."""
    sh = shingles(documents, text_col)
    return _jaccard_pairs(sh, None).where(F.col("jaccard") >= threshold)


def simhash(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit sign-aggregated fingerprint over
    tf-weighted term hashes."""
    toks = tokens_array(F.col(text_col))
    tf = (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = md5_long(F.col("term"))
    bits = tf.select(
        "doc_id",
        "tf",
        h.alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
    )
    contrib = bits.withColumn(
        "w",
        F.col("tf") * (F.expr("(shiftright(h, CAST(j AS INT)) & 1) * 2 - 1")),
    )
    sums = contrib.groupBy("doc_id", "j").agg(F.sum("w").alias("s"))
    return (
        sums.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") >= 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
        .select("doc_id", F.col("simhash").cast("long").alias("simhash"))
    )


EMB_NEARDUP_THRESHOLD = 0.4


#: rows-per-(bucket, salt) target for the hot-bucket salting of the
#: bucketed joins: a bucket whose membership exceeds this splits into
#: ceil(count/target) salted sub-keys (near-dup-heavy corpora are
#: exactly the skewed case — one dense cluster would otherwise land a
#: whole bucket-pair's vectors in ONE join partition).  Env-tunable.
def _salt_target_from_env() -> int:
    import os

    raw = os.environ.get("PEFA_BUCKET_SALT_TARGET", "")
    try:
        v = int(raw)
    except ValueError:
        v = 100_000
    # <= 0 would make bucket_salts' ceil(count/target) null/inf and
    # silently drop every candidate row from the salted join
    return v if v > 0 else 100_000


BUCKET_SALT_TARGET = _salt_target_from_env()


def bucket_salts(counts: DataFrame, salt_target: int) -> DataFrame:
    """(bucket, nsalt): how many salted sub-keys each bucket needs so
    no (bucket, salt) join key exceeds ~``salt_target`` rows.  Tiny
    (centroid-count rows) — always broadcast."""
    return counts.select(
        "bucket",
        F.greatest(
            F.lit(1), F.ceil(F.col("count") / F.lit(float(salt_target)))
        ).cast("int").alias("nsalt"),
    )


def bucketed_candidate_pairs(
    embeddings: DataFrame,
    threshold: float = EMB_NEARDUP_THRESHOLD,
    n_centroids: int | None = None,
    iters: int = 2,
    salt_target: int | None = None,
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """(vec_a, vec_b, ea, eb) candidate pairs of the bucketed near-dup
    join — the pruning stage of :func:`embedding_neardup_bucketed`,
    exposed so tests can assert the candidate count stays far below
    n^2 (the whole point of the bucketing).

    Vectors bucket to their nearest k-means centroid (count data-driven
    via ann.auto_n_centroids unless pinned); each bucket keeps its
    angular radius r_b = max angle(v, c_b).  By the spherical triangle
    inequality, angle(a, b) >= angle(c_a, c_b) - r_a - r_b, so a
    bucket PAIR can only contain pairs with cos >= threshold when
    angle(c_a, c_b) <= arccos(threshold) + r_a + r_b (+1e-9 ulp margin
    keeps the bound admissible).  Only surviving bucket pairs join —
    with tight clusters that's O(sum of co-bucket sizes), never
    O(n^2).

    Pass precomputed ``centroids`` (cent_id, cvec) + ``assignments``
    (vec_id, bucket) — e.g. a persisted ANN store's frozen artifacts —
    to skip BOTH the k-means training and the n x n_centroids argmax
    pass; each vector's csim is then re-derived against its assigned
    centroid only (one narrow join).  The triangle-inequality bound
    needs only csim-to-own-bucket and the bucket radius, so it stays
    admissible for ANY assignment (nearest or frozen-model appended) —
    the pruning is complete either way."""
    from partitioned_ef_ans_spark.operators.ann import kmeans_centroids

    if (centroids is None) != (assignments is None):
        raise ValueError(
            "centroids and assignments must be supplied together"
        )
    cent = (
        centroids
        if centroids is not None
        else kmeans_centroids(embeddings, n_centroids=n_centroids, iters=iters)
    )
    dot_ec = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("cvec"),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    norm_e = F.sqrt(
        F.aggregate(
            F.col("embedding"), F.lit(0.0),
            lambda s, v: s + v.cast("double") * v.cast("double"),
        )
    )
    norm_c = F.sqrt(
        F.aggregate(F.col("cvec"), F.lit(0.0), lambda s, v: s + v * v)
    )
    clip = lambda c: F.least(F.lit(1.0), F.greatest(F.lit(-1.0), c))
    if assignments is not None:
        # re-derive each vector's csim against its ASSIGNED centroid
        # only: a narrow equi-join per row instead of the broadcast
        # argmax over every centroid (and only assigned — i.e. live —
        # vectors enter the relation, so a store's tombstone-masked
        # assignment table masks near-dup too)
        assign = (
            assignments.select("vec_id", "bucket")
            .join(embeddings.select("vec_id", "embedding"), "vec_id")
            .join(
                F.broadcast(
                    cent.select(F.col("cent_id").alias("bucket"), "cvec")
                ),
                "bucket",
            )
            .select(
                "vec_id",
                "embedding",
                "bucket",
                F.round(dot_ec / (norm_e * norm_c), 6).alias("csim"),
            )
        )
    else:
        sim = embeddings.crossJoin(F.broadcast(cent)).select(
            "vec_id", "embedding", "cent_id",
            F.round(dot_ec / (norm_e * norm_c), 6).alias("csim"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("csim"), F.asc("cent_id")
        )
        assign = (
            sim.withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
            .select(
                "vec_id", "embedding",
                F.col("cent_id").alias("bucket"), "csim",
            )
        )
    # csim is rounded to 6 decimals, so the true cosine can be up to
    # 5e-7 ABOVE the stored value (round-up would otherwise shrink the
    # radius, e.g. true cos 0.9999995 -> 1.000000 -> radius 0) — widen
    # by the rounding bound before acos so the radius stays admissible
    radii = assign.groupBy("bucket").agg(
        F.acos(clip(F.min("csim") - F.lit(5e-7))).alias("radius")
    )
    ca, cb = cent.alias("ca"), cent.alias("cb")
    dot_cc = F.aggregate(
        F.zip_with(F.col("ca.cvec"), F.col("cb.cvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    ncc = lambda side: F.sqrt(
        F.aggregate(F.col(f"{side}.cvec"), F.lit(0.0), lambda s, v: s + v * v)
    )
    cpairs = (
        ca.crossJoin(F.broadcast(cb))
        .where(F.col("ca.cent_id") <= F.col("cb.cent_id"))
        .select(
            F.col("ca.cent_id").alias("ba"),
            F.col("cb.cent_id").alias("bb"),
            F.acos(clip(dot_cc / (ncc("ca") * ncc("cb")))).alias("cangle"),
        )
    )
    import math

    # the FINAL pair filter passes round(cos, 6) >= threshold, so a
    # pair with true cos as low as threshold - 5e-7 must still be
    # reachable: widen theta by the same rounding bound the radii use
    # (acos grows as cos shrinks) or a boundary pair the brute-force
    # oracle emits could be bucket-pruned here
    theta = math.acos(max(-1.0, threshold - 5e-7))
    surviving = (
        cpairs.join(radii.withColumnRenamed("bucket", "ba")
                    .withColumnRenamed("radius", "ra"), "ba")
        .join(radii.withColumnRenamed("bucket", "bb")
              .withColumnRenamed("radius", "rb"), "bb")
        .where(F.col("cangle") <= F.lit(theta) + F.col("ra") + F.col("rb") + 1e-9)
        .select("ba", "bb")
    )
    both = surviving.unionByName(
        surviving.select(F.col("bb").alias("ba"), F.col("ba").alias("bb"))
    ).distinct()
    a = assign.select(F.col("vec_id").alias("vec_a"),
                      F.col("embedding").alias("ea"),
                      F.col("bucket").alias("ba"))
    b = assign.select(F.col("vec_id").alias("vec_b"),
                      F.col("embedding").alias("eb"),
                      F.col("bucket").alias("bb"))
    # hot-bucket salting: the b side of the bucket-keyed join splits
    # oversized buckets into hashed sub-keys; the a side REPLICATES
    # across every salt of its target bucket, so all pairs of a split
    # bucket still meet exactly once.  nsalt==1 everywhere when no
    # bucket exceeds the target (the common case) — the plan is then
    # identical to the unsalted join.
    if salt_target is None:
        salt_target = BUCKET_SALT_TARGET
    nsalt = bucket_salts(assign.groupBy("bucket").count(), salt_target)
    nsalt_bb = F.broadcast(nsalt.select(F.col("bucket").alias("bb"), "nsalt"))
    b_s = (
        b.join(nsalt_bb, "bb")
        .withColumn("salt", F.pmod(F.hash("vec_b"), F.col("nsalt")).cast("int"))
        .drop("nsalt")
    )
    a_rep = (
        a.join(F.broadcast(both), "ba")
        .join(nsalt_bb, "bb")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.col("nsalt") - F.lit(1)))
        )
        .drop("nsalt")
    )
    return (
        a_rep.join(b_s, ["bb", "salt"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "ea", "eb")
    )


def embedding_neardup_bucketed(
    embeddings: DataFrame,
    threshold: float = EMB_NEARDUP_THRESHOLD,
    n_centroids: int | None = None,
    iters: int = 2,
    salt_target: int | None = None,
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """EXACT cosine-threshold self-join without the all-pairs cross
    join — the 100 TB shape for embedding near-dup: candidates from
    :func:`bucketed_candidate_pairs` (triangle-inequality bucket-pair
    pruning, provably complete), then the exact cosine filter.  The
    OUTPUT IS IDENTICAL to the brute-force
    :func:`embedding_neardup_pairs` (same DuckDB oracle, no recall
    loss; completeness proved by the inequality, checked by the gate
    hash)."""
    cand = bucketed_candidate_pairs(
        embeddings, threshold, n_centroids, iters, salt_target,
        centroids=centroids, assignments=assignments,
    )
    return _score_candidate_pairs(cand, threshold)


def _score_candidate_pairs(cand: DataFrame, threshold: float) -> DataFrame:
    dot_ab = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda s, v: s + v.cast("double") * v.cast("double"))
    )
    return (
        cand.select(
            "vec_a", "vec_b",
            F.round(dot_ab / (nrm(F.col("ea")) * nrm(F.col("eb"))), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = EMB_NEARDUP_THRESHOLD
) -> DataFrame:
    """(vec_a, vec_b, cos): cosine >= threshold pairs, brute force.
    Scale path: :func:`embedding_neardup_bucketed` (exact, k-means
    bucketed, triangle-inequality pruned)."""
    dot = F.aggregate(
        F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.embedding"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    return (
        a.crossJoin(b)
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (norm("a") * norm("b")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
