"""Connected components over near-duplicate pair graphs.

The dedup operators (operators/dedup.py) emit PAIRS — (doc_a, doc_b)
with verified Jaccard / cosine above threshold.  A training-data
pipeline needs the transitive closure of those pairs: near-dup
CLUSTERS, one canonical survivor per cluster ("keep one copy of each
boilerplate family"), because near-duplication is not transitive pair
by pair (A~B, B~C rarely implies the A~C pair was emitted).

`connected_components` implements the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public):
each round is two vocabulary-partitioned aggregations, and the edge
set converges to star graphs centered on each component's minimum id
in O(log^2 n) rounds — no driver-side graph state, no assumption that
a component fits in one task.  This is the shape that survives 100 TB:
a label-propagation loop is O(diameter) rounds (a crawl-chain of
boilerplate can be arbitrarily deep), whereas the star algorithm's
round count is logarithmic in the node count regardless of topology.

Scale notes: every round shuffles the current edge set once per star
op (groupBy node) plus one distinct; edges only ever DECREASE in
height (re-pointing to smaller ids), and the per-node neighbor lists
the star ops aggregate are bounded by the true degree, which for
thresholded near-dup graphs is small.  AQE's skew-join handles the one
pathological case (a mega-cluster hub node).  Convergence is checked
set-wise (both-direction subtract), one cheap job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hard stop for the star loop — O(log^2 n) rounds suffice for any
#: real graph (2^64 nodes < 64 rounds); hitting this means a bug, not
#: a big input, so fail loudly instead of returning a wrong fixpoint.
MAX_ROUNDS = 64

_MAP_SCHEMA = "doc_id long, cluster_id long"


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(N(u) + {u})."""
    nbrs = _symmetrize(e)
    mins = nbrs.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("m")
    )
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint, then connect u and all
    its smaller neighbors to the smallest of them."""
    oriented = _symmetrize(e).where(F.col("v") < F.col("u"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    child_edges = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        child_edges.unionByName(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """(doc_id, cluster_id) for every node that appears in ``pairs``,
    where cluster_id = the minimum node id of its connected component.

    Deterministic: only min-aggregations, no iteration-order
    dependence.  Nodes with no edges don't appear — callers that need
    total coverage left-join and coalesce (see `neardup_clusters`).
    """
    spark = pairs.sparkSession
    e = (
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.isEmpty():
        return spark.createDataFrame([], _MAP_SCHEMA)

    for _ in range(max_rounds):
        # localCheckpoint truncates the lineage: without it the plan
        # doubles per round and Catalyst analysis time, not the data,
        # becomes the bottleneck
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        stable = (
            new_e.subtract(e).unionByName(e.subtract(new_e)).isEmpty()
        )
        old = e
        e = new_e
        if stable:
            break
        old.unpersist()
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds — alternating star converges in O(log^2 n); this "
            "is a bug, not a large input"
        )

    # converged: e is (child, component_min); centers map to themselves
    centers = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        e.unionByName(centers)
        .distinct()
        .select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    )


def neardup_clusters(
    documents: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Total (doc_id, cluster_id) assignment over ``documents``:
    cluster_id = min doc_id of the near-dup component (MinHash-LSH
    pairs by default), own id for docs with no near-duplicate."""
    if pairs is None:
        from partitioned_ef_ans_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(documents, text_col)
    cc = connected_components(pairs)
    return documents.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )


def dedup_survivors(
    documents: DataFrame, clusters: DataFrame
) -> DataFrame:
    """Keep exactly one document per near-dup cluster — the canonical
    (minimum-id) member.  ``clusters`` is `neardup_clusters` output;
    the join is on doc_id so document payload columns pass through."""
    keep = clusters.where(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    return documents.join(keep, "doc_id", "left_semi")
