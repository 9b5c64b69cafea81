"""Gate wiring for the training-data-pipeline operators (dedup,
similarity search, text analysis) — Spark entries + DuckDB oracles.

Shared determinism rules with gate.py: md5-prefix hashing (identical
in both engines), scores rounded to 6 decimals BEFORE ranking, ties by
id ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.functions import text as t_mod
from partitioned_ef_ans_spark.operators import ann as ann_mod
from partitioned_ef_ans_spark.operators import dedup as d_mod

_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '')"
_MD5_15 = "CAST(('0x' || substr(md5({e}), 1, 15)) AS BIGINT)"
_MD5_13 = "CAST(('0x' || substr(md5({e}), 1, 13)) AS BIGINT)"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------ text analysis

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t_mod.token_counts(_docs(spark, sf_dir))


def sql_token_counts() -> str:
    return f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_pieces,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t_mod.quality_score(_docs(spark, sf_dir))


def sql_quality_score() -> str:
    stop = ", ".join(f"'{s}'" for s in t_mod.STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN ({stop}))) AS DOUBLE) AS stop,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE) AS totlen
  FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       round(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END, 6) AS stopword_ratio,
       round(CASE WHEN n > 0 THEN totlen / n ELSE 0.0 END, 6) AS mean_token_len,
       round(1.0 / (1.0 + exp(-(0.01 * n - 2.0 * (CASE WHEN n > 0 THEN stop / n ELSE 0.0 END)))), 6) AS quality
FROM m"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t_mod.lang_id(_docs(spark, sf_dir))


def sql_lang_id() -> str:
    langs = sorted(t_mod.LANG_MARKERS)
    hit_cols = ",\n         ".join(
        "CAST(len(list_filter(toks, x -> x IN ({m}))) AS BIGINT) AS h_{l}".format(
            m=", ".join(f"'{w}'" for w in t_mod.LANG_MARKERS[l]), l=l
        )
        for l in langs
    )
    best = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
h AS (SELECT doc_id,
         {hit_cols}
      FROM t)
SELECT doc_id, {case} AS pred_lang FROM h"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t_mod.fingerprint(_docs(spark, sf_dir))


def sql_fingerprint() -> str:
    h = _MD5_13.format(e="term || ':' || CAST(pos AS VARCHAR)")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
e AS (SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos FROM t WHERE len(toks) > 0)
SELECT doc_id, CAST(bit_xor({h}) AS BIGINT) AS fp FROM e GROUP BY doc_id"""


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t_mod.repetition_signals(_docs(spark, sf_dir))


def sql_repetition_signals() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
bi AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS bg,
         w
  FROM t
),
base AS (
  SELECT doc_id,
         CAST(len(w) AS DOUBLE) AS n,
         CAST(len(list_distinct(w)) AS DOUBLE) AS nd,
         CAST(len(bg) AS DOUBLE) AS nb,
         CAST(len(list_distinct(bg)) AS DOUBLE) AS nbd
  FROM bi
),
tops AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) AS top FROM (
    SELECT doc_id, term, count(*) AS c
    FROM (SELECT doc_id, unnest(w) AS term FROM t)
    GROUP BY doc_id, term
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       round(CASE WHEN n > 0 THEN (n - nd) / n ELSE 0.0 END, 6) AS dup_token_frac,
       round(CASE WHEN n > 0 THEN coalesce(tops.top, 0.0) / n ELSE 0.0 END, 6) AS top_token_frac,
       round(CASE WHEN nb > 0 THEN (nb - nbd) / nb ELSE 0.0 END, 6) AS dup_bigram_frac
FROM base b LEFT JOIN tops USING (doc_id)"""


# ---------------------------------------------------------------- dedup

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return d_mod.exact_dedup(_docs(spark, sf_dir))


def sql_exact_dedup() -> str:
    return """
SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_doc_id
FROM documents"""


_SH_CTE = f"""
t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
  FROM t, UNNEST(range(len(w) - 2)) AS u(i) WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)"""

_JACCARD_SEL = """
SELECT i.doc_a, i.doc_b,
       round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return d_mod.ngram_jaccard_pairs(_docs(spark, sf_dir))


def sql_ngram_jaccard() -> str:
    return f"""
WITH {_SH_CTE},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS ({_JACCARD_SEL})
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= {d_mod.JACCARD_THRESHOLD}"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return d_mod.minhash_lsh_pairs(_docs(spark, sf_dir))


def sql_minhash_lsh() -> str:
    nh, bands = d_mod.NUM_HASHES, d_mod.BANDS
    rpb = nh // bands
    mh_cols = ",\n         ".join(
        "min({h}) AS mh_{i}".format(
            h=_MD5_15.format(e=f"'{i}' || ':' || shingle"), i=i
        )
        for i in range(nh)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ':' || ".join(
            f"CAST(mh_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
        )
        + " AS sig FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_SH_CTE},
sig AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh GROUP BY doc_id
),
buckets AS ({band_selects}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
),
j AS ({_JACCARD_SEL})
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= {d_mod.JACCARD_THRESHOLD}"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the MinHash-LSH near-dup pairs: every doc
    mapped to its component's minimum doc_id (operators/cc.py
    alternating large-star/small-star; singletons map to themselves).
    The step that turns pair emission into "keep one survivor per
    boilerplate family"."""
    from partitioned_ef_ans_spark.operators import cc as cc_mod

    docs = _docs(spark, sf_dir)
    return cc_mod.neardup_clusters(docs, d_mod.minhash_lsh_pairs(docs))


def sql_neardup_clusters() -> str:
    """Connected components in ANSI SQL: recursive CTE computing the
    reachability set of every endpoint over the (symmetrized) verified
    LSH pairs, component id = least(doc_id, min reachable).  UNION
    (not ALL) bounds the fixpoint; fine at gate scale, while the Spark
    side runs the O(log^2 n)-round star algorithm."""
    return f"""
WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ({sql_minhash_lsh()}) q),
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION ALL SELECT doc_b AS a, doc_a AS b FROM p),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
lbl AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY a)
SELECT d.doc_id,
       CAST(coalesce(least(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN lbl l USING (doc_id)"""


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/hybrid.py): the gate's BM25 ranked
    disjunction top-10 fused with dense cosine top-10 by reciprocal
    rank — the sparse+dense RAG retrieval recipe.  Query pairing is
    deterministic: text query ``query_id`` uses the embedding of
    ``vec_id == query_id`` as its dense query vector.  Asymmetric
    coverage is exercised by construction (the all-OOV gate query has
    an empty sparse list; its dense list still ranks).  Three hashed
    variants: ``brute`` (exhaustive dense leg), ``ivf`` (IVF-probe
    dense leg), and ``persisted`` (BOTH legs served end-to-end from
    persisted artifacts via hybrid_search_persisted — compressed text
    index dir + ANN store dir, the deployment RAG shape)."""
    from partitioned_ef_ans_spark import gate as g_mod
    from partitioned_ef_ans_spark.operators import hybrid as h_mod

    from partitioned_ef_ans_spark.operators import ann as ann_mod

    qids = [qid for qid, _terms in g_mod.GATE_QUERIES]
    sparse = g_mod.q_ranked_or(spark, sf_dir)
    qvecs = (
        _embs(spark, sf_dir)
        .where(F.col("vec_id").isin(qids))
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    dense = h_mod.dense_topk_for_queries(qvecs, _embs(spark, sf_dir), k=10)
    brute = h_mod.rrf_fuse([sparse, dense], k=10).withColumn(
        "variant", F.lit("brute")
    )
    # the scale twin: IVF-probe dense leg (centroids pinned to the 8
    # smallest vec_ids so the textual oracle replays the bucketing;
    # production default is data-driven auto_n_centroids)
    dense_ivf = ann_mod.ivf_dense_topk(
        qvecs, _embs(spark, sf_dir), k=10, n_centroids=8, nprobe=2
    )
    ivf = h_mod.rrf_fuse([sparse, dense_ivf], k=10).withColumn(
        "variant", F.lit("ivf")
    )
    # the end-to-end serving twin: BOTH legs from persisted artifacts
    # (compressed text index dir + ANN store dir) through
    # hybrid_search_persisted — the RAG shape a deployment runs.  The
    # sparse leg is run_ranked(blockmax) over the gate index (rank-
    # identical to the ranked-OR oracle, certified by the ranked
    # gates) and the dense leg is the store's IVF probe over the same
    # pinned centroids, so the fused relation hashes against the SAME
    # textual replay as the in-session ivf variant.
    ix = g_mod._get_index(spark, sf_dir)
    pers = h_mod.hybrid_search_persisted(
        spark,
        ix["out_dir"],
        _get_ann_store(spark, sf_dir),
        g_mod.gate_queries_df(spark),
        qvecs,
        _embs(spark, sf_dir),
        k=10,
        mode="blockmax",
        dtype="float64",
        nprobe=2,
    ).withColumn("variant", F.lit("persisted"))
    return brute.unionByName(ivf).unionByName(pers)


def sql_hybrid_rrf() -> str:
    from partitioned_ef_ans_spark import gate as g_mod

    qids = ", ".join(str(qid) for qid, _terms in g_mod.GATE_QUERIES)
    return f"""
WITH {_EMB_NORM_CTE},
sparse AS (SELECT query_id, "rank", doc_id FROM ({g_mod.sql_ranked_or()})),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
       WHERE vec_id IN ({qids})),
dots AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         list_sum(list_transform(range(1, len(qv.embedding)+1),
                  i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot
  FROM qv CROSS JOIN embeddings e
),
cosv AS (
  SELECT d.query_id, d.doc_id, round(d.dot / (nq.nn * nd.nn), 6) AS cos
  FROM dots d JOIN nrm nq ON d.query_id = nq.vec_id
  JOIN nrm nd ON d.doc_id = nd.vec_id
),
dense AS (
  SELECT query_id, CAST(row_number() OVER w AS INT) AS "rank", doc_id
  FROM cosv
  WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, doc_id)
  QUALIFY "rank" <= 10
),
cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         FROM embeddings ORDER BY vec_id LIMIT 8),
csim AS (
  SELECT e.vec_id, c.cent_id,
         round(list_sum(list_transform(range(1, len(e.embedding)+1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (ne.nn * nc.nn), 6) AS csim
  FROM embeddings e JOIN nrm ne ON e.vec_id = ne.vec_id
       CROSS JOIN cent c JOIN nrm nc ON c.cent_id = nc.vec_id
),
assign AS (
  SELECT vec_id, cent_id AS bucket FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cent_id) AS crank
    FROM csim
  ) WHERE crank = 1
),
qsim AS (
  SELECT qv.query_id, c.cent_id,
         round(list_sum(list_transform(range(1, len(qv.embedding)+1),
                 i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (nq.nn * nc.nn), 6) AS csim
  FROM qv JOIN nrm nq ON qv.query_id = nq.vec_id
       CROSS JOIN cent c JOIN nrm nc ON c.cent_id = nc.vec_id
),
probes AS (
  SELECT query_id, cent_id AS bucket FROM (
    SELECT query_id, cent_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY csim DESC, cent_id) AS crank
    FROM qsim
  ) WHERE crank <= 2
),
icand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS doc_id
  FROM probes p JOIN assign a ON p.bucket = a.bucket
),
idots AS (
  SELECT c.query_id, c.doc_id,
         list_sum(list_transform(range(1, len(qe.embedding)+1),
                  i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(de.embedding[i] AS DOUBLE))) AS dot
  FROM icand c JOIN embeddings qe ON qe.vec_id = c.query_id
               JOIN embeddings de ON de.vec_id = c.doc_id
),
icos AS (
  SELECT d.query_id, d.doc_id, round(d.dot / (nq.nn * nd.nn), 6) AS cos
  FROM idots d JOIN nrm nq ON d.query_id = nq.vec_id
  JOIN nrm nd ON d.doc_id = nd.vec_id
),
dense_ivf AS (
  SELECT query_id, CAST(row_number() OVER w AS INT) AS "rank", doc_id
  FROM icos
  WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, doc_id)
  QUALIFY "rank" <= 10
),
contrib AS (
  SELECT 'brute' AS variant, query_id, doc_id, 1.0 / (60.0 + "rank") AS c FROM sparse
  UNION ALL
  SELECT 'brute' AS variant, query_id, doc_id, 1.0 / (60.0 + "rank") AS c FROM dense
  UNION ALL
  SELECT 'ivf' AS variant, query_id, doc_id, 1.0 / (60.0 + "rank") AS c FROM sparse
  UNION ALL
  SELECT 'ivf' AS variant, query_id, doc_id, 1.0 / (60.0 + "rank") AS c FROM dense_ivf
  UNION ALL
  SELECT 'persisted' AS variant, query_id, doc_id, 1.0 / (60.0 + "rank") AS c FROM sparse
  UNION ALL
  SELECT 'persisted' AS variant, query_id, doc_id, 1.0 / (60.0 + "rank") AS c FROM dense_ivf
),
fused AS (
  SELECT variant, query_id, doc_id, round(sum(c), 7) AS rrf
  FROM contrib GROUP BY variant, query_id, doc_id
)
SELECT query_id, CAST(row_number() OVER w2 AS INT) AS "rank", doc_id, rrf, variant
FROM fused
WINDOW w2 AS (PARTITION BY variant, query_id ORDER BY rrf DESC, doc_id)
QUALIFY "rank" <= 10"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return d_mod.simhash(_docs(spark, sf_dir))


def sql_simhash() -> str:
    h = _MD5_15.format(e="term")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
hh AS (SELECT doc_id, tf, {h} AS h FROM tf),
bits AS (
  SELECT doc_id, u.j AS j, sum(tf * (((h >> u.j) & 1) * 2 - 1)) AS s
  FROM hh, UNNEST(range({d_mod.SIMHASH_BITS})) AS u(j)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return d_mod.embedding_neardup_pairs(_embs(spark, sf_dir))


def q_embedding_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-means-bucketed threshold join (triangle-inequality
    pruning) — must hash-match the brute-force oracle exactly (no
    recall loss by construction).  n_centroids pinned to 8 so the
    textual oracle replays the same clustering; production default is
    data-driven (ann.auto_n_centroids)."""
    return d_mod.embedding_neardup_bucketed(_embs(spark, sf_dir), n_centroids=8)


_EMB_NORM_CTE = """
nrm AS (
  SELECT vec_id, sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nn
  FROM embeddings
)"""


def sql_embedding_neardup() -> str:
    return f"""
WITH {_EMB_NORM_CTE},
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
cosv AS (
  SELECT vec_a, vec_b, round(dot / (na.nn * nb.nn), 6) AS cos
  FROM dots JOIN nrm na ON vec_a = na.vec_id JOIN nrm nb ON vec_b = nb.vec_id
)
SELECT vec_a, vec_b, cos FROM cosv WHERE cos >= 0.4"""


# ------------------------------------------------------------------- ANN

def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_mod.cosine_topk(_embs(spark, sf_dir))


def sql_ann_topk(k: int = 5) -> str:
    return f"""
WITH {_EMB_NORM_CTE},
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS neighbor,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
cosv AS (
  SELECT dots.qid AS vec_id, dots.neighbor AS neighbor, round(dot / (na.nn * nb.nn), 6) AS cos
  FROM dots JOIN nrm na ON dots.qid = na.vec_id JOIN nrm nb ON dots.neighbor = nb.vec_id
)
SELECT vec_id, CAST(row_number() OVER w AS INT) AS "rank", neighbor, cos
FROM cosv
WINDOW w AS (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
QUALIFY "rank" <= {k}"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_centroids pinned (oracle SQL hard-codes LIMIT 8 by vec_id
    # order); the production default derives the count from the table
    return ann_mod.ivf_topk(_embs(spark, sf_dir), n_centroids=8)


def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with trained Lloyd k-means centroids (2 iterations,
    deterministic init + per-step rounding so DuckDB replays the exact
    clustering)."""
    embs = _embs(spark, sf_dir)
    cent = ann_mod.kmeans_centroids(embs, n_centroids=8, iters=2)
    return ann_mod.ivf_topk(embs, centroids=cent)


def _sql_kmeans_iter(cent_in: str, assign_out: str, cent_out: str) -> str:
    return f"""
sim_{assign_out} AS (
  SELECT e.vec_id, c.cent_id, e.embedding,
         round(list_sum(list_transform(range(1, len(e.embedding)+1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))
               / (ne.nn * sqrt(list_sum(list_transform(c.cvec, x -> x * x)))), 6) AS csim
  FROM embeddings e JOIN nrm ne ON e.vec_id = ne.vec_id CROSS JOIN {cent_in} c
),
{assign_out} AS (
  SELECT cent_id, embedding FROM (
    SELECT cent_id, embedding,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS r
    FROM sim_{assign_out}
  ) WHERE r = 1
),
{cent_out} AS (
  -- scaled-integer mean (matches ann.kmeans_centroids): exact,
  -- summation-order-free, identical across engines — a double avg()
  -- could flip round(·,6) on an ulp boundary
  SELECT cent_id, list(m ORDER BY pos) AS cvec FROM (
    SELECT cent_id, pos,
           round(CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1000000.0, 6) AS m
    FROM (
      SELECT cent_id, unnest(embedding) AS v,
             unnest(range(len(embedding))) AS pos
      FROM {assign_out}
    )
    GROUP BY cent_id, pos
  ) GROUP BY cent_id
)"""


def sql_ann_ivf_kmeans(k: int = 5, nprobe: int = 2) -> str:
    iters = (
        _sql_kmeans_iter("cent0", "asg1", "cent1")
        + ","
        + _sql_kmeans_iter("cent1", "asg2", "cent2")
    )
    return f"""
WITH {_EMB_NORM_CTE},
cent0 AS (
  SELECT vec_id AS cent_id,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
),{iters},
csim AS (
  SELECT e.vec_id, c.cent_id,
         round(list_sum(list_transform(range(1, len(e.embedding)+1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]))
               / (ne.nn * sqrt(list_sum(list_transform(c.cvec, x -> x * x)))), 6) AS csim
  FROM embeddings e JOIN nrm ne ON e.vec_id = ne.vec_id CROSS JOIN cent2 c
),
ranked AS (
  SELECT vec_id, cent_id, csim,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crank
  FROM csim
),
assign AS (SELECT vec_id, cent_id AS bucket FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id, cent_id AS bucket FROM ranked WHERE crank <= {nprobe}),
cand AS (
  SELECT DISTINCT q.vec_id AS vec_id, t.vec_id AS neighbor
  FROM probes q JOIN assign t ON q.bucket = t.bucket AND q.vec_id <> t.vec_id
),
dots AS (
  SELECT c.vec_id AS qid, c.neighbor AS neighbor,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM cand c JOIN embeddings a ON a.vec_id = c.vec_id
              JOIN embeddings b ON b.vec_id = c.neighbor
),
cosv AS (
  SELECT dots.qid AS vec_id, dots.neighbor AS neighbor, round(dot / (na.nn * nb.nn), 6) AS cos
  FROM dots JOIN nrm na ON dots.qid = na.vec_id JOIN nrm nb ON dots.neighbor = nb.vec_id
)
SELECT vec_id, CAST(row_number() OVER w AS INT) AS "rank", neighbor, cos
FROM cosv
WINDOW w AS (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
QUALIFY "rank" <= {k}"""



def _sql_ivf_bucketing(n_centroids: int, nprobe: int) -> str:
    """The pinned-centroid IVF bucketing replay shared by every
    self-join ANN oracle (cent -> csim -> ranked -> assign -> probes ->
    cand with self-exclusion): ONE copy, so a change to the bucketing
    discipline (rounding, tie-break) cannot hash-diverge a single
    variant while the others move."""
    return f"""cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT {n_centroids}),
csim AS (
  SELECT e.vec_id, c.cent_id,
         round(list_sum(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (ne.nn * nc.nn), 6) AS csim
  FROM embeddings e JOIN nrm ne ON e.vec_id = ne.vec_id
       CROSS JOIN cent c JOIN nrm nc ON c.cent_id = nc.vec_id
),
ranked AS (
  SELECT vec_id, cent_id, csim,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crank
  FROM csim
),
assign AS (SELECT vec_id, cent_id AS bucket FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id, cent_id AS bucket FROM ranked WHERE crank <= {nprobe}),
cand AS (
  SELECT DISTINCT q.vec_id AS vec_id, t.vec_id AS neighbor
  FROM probes q JOIN assign t ON q.bucket = t.bucket AND q.vec_id <> t.vec_id
)"""


def sql_ann_ivf(k: int = 5, n_centroids: int = 8, nprobe: int = 2) -> str:
    return f"""
WITH {_EMB_NORM_CTE},
{_sql_ivf_bucketing(n_centroids, nprobe)},
dots AS (
  SELECT c.vec_id AS qid, c.neighbor AS neighbor,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM cand c JOIN embeddings a ON a.vec_id = c.vec_id
              JOIN embeddings b ON b.vec_id = c.neighbor
),
cosv AS (
  SELECT dots.qid AS vec_id, dots.neighbor AS neighbor, round(dot / (na.nn * nb.nn), 6) AS cos
  FROM dots JOIN nrm na ON dots.qid = na.vec_id JOIN nrm nb ON dots.neighbor = nb.vec_id
)
SELECT vec_id, CAST(row_number() OVER w AS INT) AS "rank", neighbor, cos
FROM cosv
WINDOW w AS (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
QUALIFY "rank" <= {k}"""


def sql_ann_ivf_sq8(
    k: int = 5, n_centroids: int = 8, nprobe: int = 2, rescore_mult: int = 3
) -> str:
    """sql_ann_ivf + the int8 first pass: q8 quantizes the normalized
    vectors exactly as ann.sq8_quantize (same IEEE-double op order,
    floor(x+0.5)); pre ranks candidates by the exact integer dot; kept
    cuts to k*rescore_mult per query (qdot DESC, neighbor ASC); the
    float rescore runs only on the survivors."""
    return f"""
WITH {_EMB_NORM_CTE},
{_sql_ivf_bucketing(n_centroids, nprobe)},
q8 AS (
  SELECT e.vec_id,
         list_transform(range(1, len(e.embedding)+1),
           i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) / n.nn * 127.0 + 0.5) AS BIGINT)) AS qvec
  FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id
),
pre AS (
  SELECT c.vec_id, c.neighbor,
         list_sum(list_transform(range(1, len(a.qvec)+1), i -> a.qvec[i] * b.qvec[i])) AS qdot
  FROM cand c JOIN q8 a ON a.vec_id = c.vec_id JOIN q8 b ON b.vec_id = c.neighbor
),
kept AS (
  SELECT vec_id, neighbor FROM (
    SELECT vec_id, neighbor,
           row_number() OVER (PARTITION BY vec_id ORDER BY qdot DESC, neighbor) AS prerank
    FROM pre)
  WHERE prerank <= {int(k) * int(rescore_mult)}
),
dots AS (
  SELECT c.vec_id AS qid, c.neighbor AS neighbor,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM kept c JOIN embeddings a ON a.vec_id = c.vec_id
              JOIN embeddings b ON b.vec_id = c.neighbor
),
cosv AS (
  SELECT dots.qid AS vec_id, dots.neighbor AS neighbor, round(dot / (na.nn * nb.nn), 6) AS cos
  FROM dots JOIN nrm na ON dots.qid = na.vec_id JOIN nrm nb ON dots.neighbor = nb.vec_id
)
SELECT vec_id, CAST(row_number() OVER w AS INT) AS "rank", neighbor, cos
FROM cosv
WINDOW w AS (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
QUALIFY "rank" <= {k}"""


def _sql_pq_iter(cb_in: str, asg: str, cb_out: str, d: int) -> str:
    """One Lloyd iteration over all m subspaces at once (matches
    ann.pq_codebooks_trained): round-6 squared-L2 argmin with code_id
    tie-break, then a per-(s, code_id, pos) scaled-integer mean."""
    rng = f"range(1, {d + 1})"
    return f"""
dists_{asg} AS (
  SELECT sub.vec_id, sub.s, cb.code_id, sub.vsub,
         round(list_sum(list_transform({rng}, i -> (sub.vsub[i]-cb.csub[i])*(sub.vsub[i]-cb.csub[i]))), 6) AS dist
  FROM subs sub JOIN {cb_in} cb ON sub.s = cb.s
),
{asg} AS (
  SELECT s, code_id, vsub FROM (
    SELECT s, code_id, vsub,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code_id) AS rn
    FROM dists_{asg}
  ) WHERE rn = 1
),
{cb_out} AS (
  -- scaled-integer mean (matches ann.kmeans_centroids / trained PQ):
  -- exact, summation-order-free, identical across engines
  SELECT s, code_id, list(mu ORDER BY pos) AS csub FROM (
    SELECT s, code_id, pos,
           round(CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / count(*) / 1000000.0, 6) AS mu
    FROM (
      SELECT s, code_id, unnest(vsub) AS v,
             unnest(range(len(vsub))) AS pos
      FROM {asg}
    )
    GROUP BY s, code_id, pos
  ) GROUP BY s, code_id
)"""


def sql_ann_ivf_pq(
    k: int = 5, n_centroids: int = 8, nprobe: int = 2,
    m: int = 8, d: int = 8, ks: int = 16, rescore_mult: int = 3,
    trained_iters: int = 0,
) -> str:
    """sql_ann_ivf + the PQ-ADC first pass: per-subspace codebooks are
    the normalized slices of the ks smallest vec_ids (or, with
    ``trained_iters`` > 0, that init rounded to 6 then Lloyd-refined
    via :func:`_sql_pq_iter` — replaying ann.pq_codebooks_trained);
    codes = argmin of round-6 squared-L2 (code_id tie-break); the ADC
    table is an INTEGER LUT (round(dot*1e6) as BIGINT) so the per-pair
    sum over m subspaces is order-free in both engines; the float
    rescore runs only on the kept candidates."""
    rng = f"range(1, {d + 1})"
    cb_pinned = f"""cb0 AS (
  SELECT s, vec_id AS code_id, vsub AS csub FROM subs
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ks})
),"""
    if trained_iters:
        chain = f"""cb0r AS (
  SELECT s, code_id, list_transform(csub, x -> round(x, 6)) AS csub FROM cb0
),"""
        prev = "cb0r"
        for it in range(1, trained_iters + 1):
            chain += _sql_pq_iter(prev, f"pqasg{it}", f"cb{it}", d) + ","
            prev = f"cb{it}"
        cb_cte = cb_pinned + chain + f"cb AS (SELECT * FROM {prev}),"
    else:
        cb_cte = cb_pinned + "cb AS (SELECT * FROM cb0),"
    return f"""
WITH {_EMB_NORM_CTE},
nv AS (
  SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.nn) AS nv
  FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id
),
subs AS (
  SELECT vec_id, s, nv[s*{d}+1 : s*{d}+{d}] AS vsub
  FROM nv, UNNEST(range({m})) t(s)
),
{cb_cte}
dists AS (
  SELECT sub.vec_id, sub.s, cb.code_id,
         round(list_sum(list_transform({rng}, i -> (sub.vsub[i]-cb.csub[i])*(sub.vsub[i]-cb.csub[i]))), 6) AS dist
  FROM subs sub JOIN cb ON sub.s = cb.s
),
codes AS (
  SELECT vec_id, s, code_id AS code FROM (
    SELECT vec_id, s, code_id,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code_id) AS rn
    FROM dists)
  WHERE rn = 1
),
lut AS (
  SELECT sub.vec_id, sub.s, cb.code_id,
         CAST(round(list_sum(list_transform({rng}, i -> sub.vsub[i]*cb.csub[i])) * 1e6) AS BIGINT) AS lut_i
  FROM subs sub JOIN cb ON sub.s = cb.s
),
{_sql_ivf_bucketing(n_centroids, nprobe)},
adc AS (
  SELECT c.vec_id, c.neighbor, SUM(l.lut_i) AS adc
  FROM cand c
       JOIN codes t ON t.vec_id = c.neighbor
       JOIN lut l ON l.vec_id = c.vec_id AND l.s = t.s AND l.code_id = t.code
  GROUP BY 1, 2
),
kept AS (
  SELECT vec_id, neighbor FROM (
    SELECT vec_id, neighbor,
           row_number() OVER (PARTITION BY vec_id ORDER BY adc DESC, neighbor) AS prerank
    FROM adc)
  WHERE prerank <= {int(k) * int(rescore_mult)}
),
dots AS (
  SELECT c.vec_id AS qid, c.neighbor AS neighbor,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM kept c JOIN embeddings a ON a.vec_id = c.vec_id
              JOIN embeddings b ON b.vec_id = c.neighbor
),
cosv AS (
  SELECT dots.qid AS vec_id, dots.neighbor AS neighbor, round(dot / (na.nn * nb.nn), 6) AS cos
  FROM dots JOIN nrm na ON dots.qid = na.vec_id JOIN nrm nb ON dots.neighbor = nb.vec_id
)
SELECT vec_id, CAST(row_number() OVER w AS INT) AS "rank", neighbor, cos
FROM cosv
WINDOW w AS (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
QUALIFY "rank" <= {k}"""


# -------------------------------------------------- sha invariant / verify

def q_corpus_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.json per-row invariant: sha256(content) fingerprints of
    the corpus adaptation (verified against the DuckDB-computed
    truth)."""
    from partitioned_ef_ans_spark.corpus import corpus_from_documents, corpus_sha

    return corpus_sha(corpus_from_documents(_docs(spark, sf_dir))).select(
        "repo", "path", "sha256"
    )


def sql_corpus_sha() -> str:
    return """
SELECT source AS repo,
       printf('doc/%09d.txt', doc_id) AS path,
       sha256(text) AS sha256
FROM documents"""


def q_transform_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 (transform_queries.cpp): text queries -> (stemmed-id,
    unstemmed-id) sequences with whole-query OOV drop.  Oracle-hashed
    via the pinned stem table (functions/stem_fixture.py) — DuckDB has
    no Porter stemmer, but the gate vocabulary is closed, so the
    fixture join is exact; semantics also covered by
    tests/test_transform.py."""
    from partitioned_ef_ans_spark import tokenizer
    from partitioned_ef_ans_spark.operators.dictionary import build_term_dictionary
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.operators.transform import (
        stem_udf_df,
        transform_queries,
    )
    from partitioned_ef_ans_spark.gate import GATE_QUERIES

    docs = _docs(spark, sf_dir)
    tokens = tokenizer.tokenize(docs, doc_col="doc_id", text_col="text")
    udict = build_term_dictionary(tokens)
    sdict = build_term_dictionary(
        stem_udf_df(tokens.select("term").distinct())
        .select(F.col("stemmed").alias("term"))
        .distinct()
    )
    qdf = queries_to_df(spark, GATE_QUERIES)
    out = transform_queries(qdf, sdict, udict)
    return out.select(
        "query_id",
        F.concat_ws(" ", F.transform("term_ids", lambda x: x.cast("string"))).alias("tline"),
        F.concat_ws(" ", F.transform("uterm_ids", lambda x: x.cast("string"))).alias("uline"),
    )


def q_transform_queries_uids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6, oracle-checkable projection: the UNSTEMMED id line plus the
    whole-query OOV drop.  The drop is fully determined by the
    unstemmed lookup (any corpus term's Porter stem is by construction
    in the stemmed dictionary, so sid is null only when uid is), which
    makes this half of transform_queries exactly SQL-expressible; the
    stemmed line stays rows-only (no SQL Porter stemmer).  A pure
    projection of :func:`q_transform_queries` — one pipeline, no
    drift."""
    return q_transform_queries(spark, sf_dir).select("query_id", "uline")


def sql_transform_queries() -> str:
    """Full S6 oracle: both the stemmed and unstemmed id lines.

    DuckDB has no Porter stemmer, so stemming goes through the PINNED
    stem table (functions/stem_fixture.py — the gate corpus vocabulary
    is closed at 31 terms, identical at every sf, and pytest locks the
    fixture against a live recomputation over the actual parquet
    vocabulary).  The stemmed dictionary is rebuilt in SQL exactly as
    build_term_dictionary does it: distinct stems of distinct corpus
    terms, row_number ordered by stem, 0-based."""
    from partitioned_ef_ans_spark.functions.stem_fixture import (
        stem_fixture_values_sql,
    )
    from partitioned_ef_ans_spark.gate import GATE_QUERIES, _TOK_CTE

    rows = []
    for qid, terms in GATE_QUERIES:
        for pos, t in enumerate(terms):
            rows.append(f"({qid}, {pos}, '{t.lower()}')")
    q_vals = "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS q(query_id, pos, term)"
    return f"""
WITH {_TOK_CTE},
udict AS (
  SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
  FROM (SELECT DISTINCT term FROM tok)
),
sdict AS (
  SELECT stemmed, CAST(row_number() OVER (ORDER BY stemmed) - 1 AS BIGINT) AS sid
  FROM (
    SELECT DISTINCT stemmap.stemmed
    FROM (SELECT DISTINCT term FROM tok) v
    JOIN {stem_fixture_values_sql()} USING (term)
  )
),
q AS ({q_vals}),
qs AS (
  SELECT q.query_id, q.pos, q.term, stemmap.stemmed
  FROM q LEFT JOIN {stem_fixture_values_sql()} ON q.term = stemmap.term
),
m AS (
  SELECT qs.query_id, qs.pos, sd.sid, ud.term_id AS uid
  FROM qs
  LEFT JOIN sdict sd ON qs.stemmed = sd.stemmed
  LEFT JOIN udict ud ON qs.term = ud.term
),
keep AS (
  SELECT query_id FROM m GROUP BY query_id
  HAVING max(CASE WHEN sid IS NULL OR uid IS NULL THEN 1 ELSE 0 END) = 0
)
SELECT m.query_id,
       string_agg(CAST(sid AS VARCHAR), ' ' ORDER BY pos) AS tline,
       string_agg(CAST(uid AS VARCHAR), ' ' ORDER BY pos) AS uline
FROM m JOIN keep USING (query_id)
GROUP BY m.query_id"""


def sql_transform_queries_uids() -> str:
    from partitioned_ef_ans_spark.gate import GATE_QUERIES, _TOK_CTE

    rows = []
    for qid, terms in GATE_QUERIES:
        for pos, t in enumerate(terms):
            rows.append(f"({qid}, {pos}, '{t.lower()}')")
    q_vals = "SELECT * FROM (VALUES " + ", ".join(rows) + ") AS q(query_id, pos, term)"
    return f"""
WITH {_TOK_CTE},
dict AS (
  SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
  FROM (SELECT DISTINCT term FROM tok)
),
q AS ({q_vals}),
m AS (SELECT q.query_id, q.pos, d.term_id FROM q LEFT JOIN dict d USING (term)),
keep AS (
  SELECT query_id FROM m GROUP BY query_id
  HAVING max(CASE WHEN term_id IS NULL THEN 1 ELSE 0 END) = 0
)
SELECT m.query_id,
       string_agg(CAST(term_id AS VARCHAR), ' ' ORDER BY pos) AS uline
FROM m JOIN keep USING (query_id)
GROUP BY m.query_id"""


# ------------------------------------------------------------- multimodal

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from partitioned_ef_ans_spark.operators import multimodal as mm

    return mm.extract_meta(mm.attach_payload(_docs(spark, sf_dir)))


def sql_multimodal_meta() -> str:
    # DuckDB sha256 takes VARCHAR; payload bytes are utf-8 of text so
    # sha256(text) == sha256(payload) and octet_length(encode(text))
    # counts the same bytes.
    return """
SELECT doc_id, 'text' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha
FROM documents"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature plumbing end-to-end.  The stub
    features are sha256-derived, so DuckDB can reproduce them exactly:
    the gate projects the float32 vector to (doc_id, i, feat) scalar
    rows (the array column itself is unhashable for the driver's
    canonicalizer)."""
    from partitioned_ef_ans_spark.operators import multimodal as mm

    feats = mm.decode_features(mm.attach_payload(_docs(spark, sf_dir)))
    return feats.select(
        "doc_id", F.posexplode("features").alias("i", "feat")
    ).select(
        "doc_id",
        F.col("i").cast("int").alias("i"),
        F.round(F.col("feat").cast("double"), 6).alias("feat"),
    )


def sql_multimodal_features() -> str:
    """feature[i] = float32(uint32_le(sha256(payload)[4i:4i+4]) / 2^32)
    (operators/multimodal.py decode_features stub), reproduced from the
    sha256 hex string: little-endian byte reassembly, /2^32 in double
    (exact), round-to-float32, then round(…, 6) in double on both
    engines."""
    le_hex = (
        "substr(sha, 8*i+7, 2) || substr(sha, 8*i+5, 2) || "
        "substr(sha, 8*i+3, 2) || substr(sha, 8*i+1, 2)"
    )
    return f"""
WITH s AS (SELECT doc_id, sha256(text) AS sha FROM documents),
b AS (
  SELECT doc_id, i, CAST(('0x' || {le_hex}) AS BIGINT) AS u
  FROM s, UNNEST(range(8)) AS t(i)
)
SELECT doc_id, CAST(i AS INT) AS i,
       round(CAST(CAST(CAST(u AS DOUBLE) / 4294967296.0 AS REAL) AS DOUBLE), 6) AS feat
FROM b"""


# ------------------------------------------------------------ event stream

def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts + value sums over the events
    table (batch twin of streaming/events.py; window start emitted as
    a timezone-free formatted string so both engines agree on the
    representation — the parquet ts is TIMESTAMP_NTZ)."""
    from partitioned_ef_ans_spark.operators.events import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


def sql_events_windowed() -> str:
    return """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2"""


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization (30-minute gap) per user — lag +
    cumulative window functions, no UDFs."""
    from partitioned_ef_ans_spark.operators.events import user_session_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return user_session_counts(ev)


def sql_events_sessions() -> str:
    return """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id"""


def q_ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + signed-int8 scalar quantization first pass
    (operators/ann.py::sq8_ivf_topk): the candidate pairs of the
    pinned-centroid IVF are cut to k*rescore_mult per query on the
    exact integer dot of the quantized normalized vectors, then
    rescored with the float cosine.  The oracle replays the
    quantization bit-for-bit (floor(x+0.5) rounds identically in both
    engines), so this hashes the whole prefilter+rescore pipeline, not
    just the final ranking."""
    return ann_mod.sq8_ivf_topk(
        _embs(spark, sf_dir), n_centroids=8, rescore_mult=3
    )


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + product-quantization ADC first pass
    (operators/ann.py::pq_ivf_topk): pinned per-subspace codebooks
    (slices of the 16 smallest vec_ids, m=8 x d=8), round-6-argmin
    codes, integer ADC LUT sum (order-free on both engines), float
    rescore of the kept candidates.  The oracle replays codebooks,
    codes, LUT, ADC, and rescore end-to-end."""
    return ann_mod.pq_ivf_topk(
        _embs(spark, sf_dir), n_centroids=8, m=8, ks=16, rescore_mult=3
    )


def q_ann_ivf_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ-ADC with Lloyd-TRAINED per-subspace codebooks
    (operators/ann.py::pq_codebooks_trained, 2 iterations): init =
    pinned codebooks rounded to 6, round-6 squared-L2 argmin
    assignment, scaled-integer means.  The oracle replays the whole
    training loop (same _sql_pq_iter pattern as trained k-means) plus
    codes, LUT, ADC, and rescore."""
    embs = _embs(spark, sf_dir)
    cb = ann_mod.pq_codebooks_trained(embs, m=8, ks=16, iters=2)
    return ann_mod.pq_ivf_topk(
        embs, n_centroids=8, m=8, ks=16, rescore_mult=3, codebooks=cb
    )


_ANN_STORE_CACHE: dict = {}


def _get_ann_store(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the persisted IVF store the persisted
    gate variants serve from — pinned centroids (``trained=False``) so
    the textual oracle can replay the bucketing."""
    import hashlib
    import os

    from partitioned_ef_ans_spark.index import ann_store

    if sf_dir not in _ANN_STORE_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/dev/shm/pefa_annstore_{os.getpid()}_{tag}"
        from partitioned_ef_ans_spark.gate import _register_shm_artifact
        _register_shm_artifact(out_dir)
        ann_store.build_ann_index(
            spark,
            _embs(spark, sf_dir),
            out_dir,
            n_centroids=8,
            trained=False,
            sq8=False,
            pq=False,
            engine="np",
        )
        _ANN_STORE_CACHE[sf_dir] = out_dir
    return _ANN_STORE_CACHE[sf_dir]


def q_ann_ivf_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-store serving (index/ann_store.py): build the IVF
    store once per sf_dir (pinned centroids so the textual oracle
    replays the bucketing), round-trip every artifact through parquet,
    then serve the 5 smallest vec_ids as EXTERNAL query vectors from
    the loaded store — ``ivf_dense_topk`` with persisted centroids,
    assignments and salt counts, zero per-batch prep.  Hash-equality
    with the from-scratch SQL replay certifies that the persisted
    artifacts are lossless and the store-served plan computes the
    identical relation."""
    from partitioned_ef_ans_spark.index import ann_store

    idx = ann_store.load_ann_index(spark, _get_ann_store(spark, sf_dir))
    embs = _embs(spark, sf_dir)
    qv = (
        embs.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    res = idx.query(qv, embs, k=5, nprobe=2)
    return res.select(
        F.col("query_id").alias("vec_id"),
        "rank",
        F.col("doc_id").alias("neighbor"),
        "cos",
    )


def sql_ann_ivf_store(
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    nq: int = 5,
    deleted_mod: tuple[int, int] | None = None,
    shard_mod: tuple[int, int] | None = None,
) -> str:
    """From-scratch replay of the store-served dense probe: pinned
    centroids, corpus assignment, the ``nq`` smallest vec_ids as
    external queries probing their ``nprobe`` closest buckets, exact
    rescore.  No self-exclusion — external-query retrieval returns the
    query's own row when it is in the corpus (deterministically, cos
    1.0 ranks first).

    ``deleted_mod=(m, r)`` replays the store's tombstone masking:
    corpus vectors with ``vec_id % m == r`` are excluded from the
    ASSIGNMENT relation only — centroids stay pinned over the full
    table (deletion never retrains models) and the query set is
    untouched (external queries are not corpus rows).

    ``shard_mod=(m, r)`` replays ONE SHARD of a scatter-gather
    deployment: the shard's corpus AND its pinned centroids come from
    ``vec_id % m == r`` rows only (each store pins the smallest ids
    of ITS OWN half), while the query set stays global — exactly what
    :func:`ann_store.query_sharded_ann` feeds every store."""
    conds = []
    if deleted_mod:
        conds.append(f"e.vec_id % {deleted_mod[0]} <> {deleted_mod[1]}")
    if shard_mod:
        conds.append(f"e.vec_id % {shard_mod[0]} = {shard_mod[1]}")
    mask = (" WHERE " + " AND ".join(conds)) if conds else ""
    cent_where = (
        f" WHERE vec_id % {shard_mod[0]} = {shard_mod[1]}"
        if shard_mod
        else ""
    )
    return f"""
WITH {_EMB_NORM_CTE},
cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings{cent_where} ORDER BY vec_id LIMIT {n_centroids}),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}),
csim AS (
  SELECT e.vec_id, c.cent_id,
         round(list_sum(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (ne.nn * nc.nn), 6) AS csim
  FROM embeddings e JOIN nrm ne ON e.vec_id = ne.vec_id
       CROSS JOIN cent c JOIN nrm nc ON c.cent_id = nc.vec_id{mask}
),
assign AS (
  SELECT vec_id, cent_id AS bucket FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS crank
    FROM csim
  ) WHERE crank = 1
),
qsim AS (
  SELECT q.query_id, c.cent_id,
         round(list_sum(list_transform(range(1, len(q.embedding)+1), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
               / (nq.nn * nc.nn), 6) AS csim
  FROM qv q JOIN nrm nq ON q.query_id = nq.vec_id
       CROSS JOIN cent c JOIN nrm nc ON c.cent_id = nc.vec_id
),
probes AS (
  SELECT query_id, cent_id AS bucket FROM (
    SELECT query_id, cent_id,
           row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cent_id) AS crank
    FROM qsim
  ) WHERE crank <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS doc_id
  FROM probes p JOIN assign a ON p.bucket = a.bucket
),
dots AS (
  SELECT c.query_id, c.doc_id,
         list_sum(list_transform(range(1, len(a.embedding)+1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot
  FROM cand c JOIN embeddings a ON a.vec_id = c.query_id
              JOIN embeddings b ON b.vec_id = c.doc_id
),
cosv AS (
  SELECT d.query_id, d.doc_id, round(d.dot / (na.nn * nb.nn), 6) AS cos
  FROM dots d JOIN nrm na ON d.query_id = na.vec_id
              JOIN nrm nb ON d.doc_id = nb.vec_id
)
SELECT query_id AS vec_id, CAST(row_number() OVER w AS INT) AS "rank", doc_id AS neighbor, cos
FROM cosv
WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, doc_id)
QUALIFY "rank" <= {k}"""


_ANN_STORE_DEL_CACHE: dict = {}

#: gate tombstone rule — corpus vectors with vec_id % 7 == 3 deleted
_ANN_DEL_MOD = (7, 3)


def q_ann_ivf_store_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstoned-store serving (ann_store.delete_vectors): a second
    store (same pinned centroids) with every ``vec_id % 7 == 3`` corpus
    vector deleted, served without compaction — the sidecar mask alone
    must make the deleted ids unreachable as candidates while models
    stay frozen.  The oracle replays the masked assignment relation in
    SQL, so the hash certifies the masking semantics end-to-end."""
    import hashlib
    import os

    from partitioned_ef_ans_spark.index import ann_store

    embs = _embs(spark, sf_dir)
    if sf_dir not in _ANN_STORE_DEL_CACHE:
        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/dev/shm/pefa_annstore_del_{os.getpid()}_{tag}"
        from partitioned_ef_ans_spark.gate import _register_shm_artifact
        _register_shm_artifact(out_dir)
        ann_store.build_ann_index(
            spark, embs, out_dir, n_centroids=8, trained=False,
            sq8=False, pq=False, engine="np",
        )
        m, r = _ANN_DEL_MOD
        dead = [
            row["vec_id"]
            for row in embs.select("vec_id").collect()
            if row["vec_id"] % m == r
        ]
        ann_store.delete_vectors(spark, out_dir, dead)
        _ANN_STORE_DEL_CACHE[sf_dir] = out_dir
    idx = ann_store.load_ann_index(spark, _ANN_STORE_DEL_CACHE[sf_dir])
    qv = (
        embs.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    res = idx.query(qv, embs, k=5, nprobe=2)
    return res.select(
        F.col("query_id").alias("vec_id"),
        "rank",
        F.col("doc_id").alias("neighbor"),
        "cos",
    )


_ANN_STORE_SHARD_CACHE: dict = {}


def _get_ann_store_shards(spark: SparkSession, sf_dir: str) -> list[str]:
    """Two disjoint stores over the vec_id-parity halves of the
    embeddings table, each pinning the 8 smallest vec_ids of ITS OWN
    half as centroids — the scatter-gather deployment the textual
    oracle replays shard by shard."""
    import hashlib
    import os

    from partitioned_ef_ans_spark.index import ann_store

    if sf_dir not in _ANN_STORE_SHARD_CACHE:
        dirs = []
        for parity in (0, 1):
            tag = hashlib.sha1(
                f"{sf_dir}|shard{parity}".encode()
            ).hexdigest()[:12]
            out_dir = f"/dev/shm/pefa_annshard_{os.getpid()}_{tag}"
            from partitioned_ef_ans_spark.gate import _register_shm_artifact
            _register_shm_artifact(out_dir)
            ann_store.build_ann_index(
                spark,
                _embs(spark, sf_dir).where(F.col("vec_id") % 2 == parity),
                out_dir,
                n_centroids=8,
                trained=False,
                sq8=False,
                pq=False,
                engine="np",
            )
            dirs.append(out_dir)
        _ANN_STORE_SHARD_CACHE[sf_dir] = dirs
    return _ANN_STORE_SHARD_CACHE[sf_dir]


def q_ann_ivf_store_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scatter-gather serving over two parity-split persisted stores
    (index/ann_store.py::query_sharded_ann): each store serves the
    global query batch top-5 from its OWN pinned centroids and
    assignments, the k-lists union, and an exact global re-rank by
    (cos desc, id) keeps the best 5 — the dense analogue of the
    sharded BM25 plane, exact without any cross-shard statistic
    because cosine is a per-pair value."""
    from partitioned_ef_ans_spark.index import ann_store

    embs = _embs(spark, sf_dir)
    qv = (
        embs.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    res = ann_store.query_sharded_ann(
        spark, _get_ann_store_shards(spark, sf_dir), qv, embs, k=5, nprobe=2
    )
    return res.select(
        F.col("query_id").alias("vec_id"),
        "rank",
        F.col("doc_id").alias("neighbor"),
        "cos",
    )


def sql_ann_ivf_store_sharded(k: int = 5) -> str:
    s0 = sql_ann_ivf_store(shard_mod=(2, 0))
    s1 = sql_ann_ivf_store(shard_mod=(2, 1))
    return f"""
SELECT vec_id, CAST(row_number() OVER w AS INT) AS "rank", neighbor, cos
FROM (SELECT vec_id, neighbor, cos FROM ({s0})
      UNION ALL SELECT vec_id, neighbor, cos FROM ({s1}))
WINDOW w AS (PARTITION BY vec_id ORDER BY cos DESC, neighbor)
QUALIFY "rank" <= {k}"""


def q_ann_ivf_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF twins (pinned centroids / trained Lloyd k-means / int8
    scalar-quantized first pass / PQ-ADC / persisted-store serving)
    collapsed into one window entry keyed by ``variant`` — same oracle
    strength as the twins it replaces, fewer slots (the codec
    family-union pattern applied to the ANN plane)."""
    a = q_ann_ivf(spark, sf_dir).withColumn("variant", F.lit("ivf"))
    b = q_ann_ivf_kmeans(spark, sf_dir).withColumn(
        "variant", F.lit("ivf_kmeans")
    )
    c = q_ann_ivf_sq8(spark, sf_dir).withColumn("variant", F.lit("ivf_sq8"))
    d = q_ann_ivf_pq(spark, sf_dir).withColumn("variant", F.lit("ivf_pq"))
    e = q_ann_ivf_pq_trained(spark, sf_dir).withColumn(
        "variant", F.lit("ivf_pq_trained")
    )
    f = q_ann_ivf_store(spark, sf_dir).withColumn(
        "variant", F.lit("ivf_store")
    )
    g = q_ann_ivf_store_deleted(spark, sf_dir).withColumn(
        "variant", F.lit("ivf_store_deleted")
    )
    h = q_ann_ivf_store_sharded(spark, sf_dir).withColumn(
        "variant", F.lit("ivf_store_sharded")
    )
    return (
        a.unionByName(b)
        .unionByName(c)
        .unionByName(d)
        .unionByName(e)
        .unionByName(f)
        .unionByName(g)
        .unionByName(h)
    )


def sql_ann_ivf_family() -> str:
    return (
        f"SELECT v.*, 'ivf' AS variant FROM ({sql_ann_ivf()}) v "
        "UNION ALL "
        f"SELECT v.*, 'ivf_kmeans' AS variant FROM ({sql_ann_ivf_kmeans()}) v "
        "UNION ALL "
        f"SELECT v.*, 'ivf_sq8' AS variant FROM ({sql_ann_ivf_sq8()}) v "
        "UNION ALL "
        f"SELECT v.*, 'ivf_pq' AS variant FROM ({sql_ann_ivf_pq()}) v "
        "UNION ALL "
        "SELECT v.*, 'ivf_pq_trained' AS variant "
        f"FROM ({sql_ann_ivf_pq(trained_iters=2)}) v "
        "UNION ALL "
        f"SELECT v.*, 'ivf_store' AS variant FROM ({sql_ann_ivf_store()}) v "
        "UNION ALL "
        "SELECT v.*, 'ivf_store_deleted' AS variant "
        f"FROM ({sql_ann_ivf_store(deleted_mod=_ANN_DEL_MOD)}) v "
        "UNION ALL "
        "SELECT v.*, 'ivf_store_sharded' AS variant "
        f"FROM ({sql_ann_ivf_store_sharded()}) v"
    )


# ------------------------------------------------- decontamination

#: gate eval set: every 97th doc poses as a benchmark item — its dup
#: twins and near-dup neighbours in the corpus are the "contaminated"
#: docs a real pipeline must catch
_EVAL_MOD = 97
#: 3-gram at this corpus size (docs are short); production uses 13
_DECONTAM_N = 3
#: keeps 74 of 213 overlapping pairs at sf0.01 — the threshold filter
#: is load-bearing, and partial (non-self) contamination survives it
_DECONTAM_MIN_OVERLAP = 0.02


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py), both serving
    shapes in one family-union entry against one oracle:

    * ``scan`` — distinct eval-item n-grams broadcast against the
      corpus shingle stream (the one-shot shape);
    * ``index`` — ``contamination_via_index`` over a width-3 shingle
      index (the refresh shape: re-decontaminating against a new eval
      set reads only the referenced posting lists, zero corpus scan).

    Both threshold on the ROUNDED overlap so engines cut identically;
    the via-index rows must equal the scan rows row-for-row."""
    from partitioned_ef_ans_spark.gate import _get_phrase_index
    from partitioned_ef_ans_spark.operators import decontam as dc_mod

    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    a = dc_mod.contamination(
        docs, ev, n=_DECONTAM_N, min_overlap=_DECONTAM_MIN_OVERLAP
    ).select(F.lit("scan").alias("variant"), "*")
    ix = _get_phrase_index(spark, sf_dir, n=_DECONTAM_N)
    b = dc_mod.contamination_via_index(
        spark, ix["index_df"], ev, ix["codec"], n=_DECONTAM_N,
        min_overlap=_DECONTAM_MIN_OVERLAP, term_stats_df=ix["term_stats"],
        index_ngram=ix["manifest"]["ngram"],
    ).select(F.lit("index").alias("variant"), "*")
    return a.unionByName(b)


def sql_decontaminate() -> str:
    base = _sql_decontaminate_scan()
    return (
        f"SELECT 'scan' AS variant, v.* FROM ({base}) v "
        "UNION ALL "
        f"SELECT 'index' AS variant, v.* FROM ({base}) v"
    )


def _sql_decontaminate_scan() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
dsh AS (SELECT DISTINCT doc_id, w[i+1]||' '||w[i+2]||' '||w[i+3] AS shingle
        FROM t, UNNEST(range(len(w)-2)) u(i) WHERE len(w) >= 3),
ev AS (SELECT doc_id AS eval_id, w FROM t WHERE doc_id % {_EVAL_MOD} = 0),
esh AS (SELECT DISTINCT eval_id, shingle FROM (
          SELECT eval_id, w[i+1]||' '||w[i+2]||' '||w[i+3] AS shingle
          FROM ev, UNNEST(range(len(w)-2)) u(i) WHERE len(w) >= 3)),
sizes AS (SELECT eval_id, count(*) AS eval_ngrams FROM esh GROUP BY eval_id),
hits AS (SELECT doc_id, eval_id, count(*) AS n_hit
         FROM dsh JOIN esh USING (shingle) GROUP BY 1, 2)
SELECT doc_id, eval_id,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(eval_ngrams AS BIGINT) AS eval_ngrams,
       round(n_hit * 1.0 / eval_ngrams, 6) AS overlap_frac
FROM hits JOIN sizes USING (eval_id)
WHERE round(n_hit * 1.0 / eval_ngrams, 6) >= {_DECONTAM_MIN_OVERLAP}"""


# ------------------------------------------- deterministic sampling

#: per-language keep rates for the training mix; zh is deliberately
#: absent — it falls to default_rate 0 (dropped), the quota-less path
SAMPLE_RATES = {"en": 0.5, "de": 0.25, "es": 0.1, "fr": 1.0}
#: exact per-language quotas; de's 100 > |de| exercises min(cap, n)
SAMPLE_CAPS = {"en": 25, "zh": 10, "de": 100}
#: token budgets (the unit a real mix is specified in); prefix-sum cut
SAMPLE_BUDGETS = {"en": 2000, "de": 800}
_SAMPLE_SEED = "mix0"


#: training_mix gate thresholds (operators/mix.py defaults)
_MIX_QUALITY_MIN = 0.6
_MIX_MAX_OVERLAP = 0.5


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators/sampling.py), all
    four serving shapes in one union entry: hash-threshold rate
    sampling (map-side only — the 100-TB shape), exact per-stratum doc
    caps (two-stage salted top-k by hash), the full ``training_mix``
    composition (quality → exact-dedup → decontam → rate sample,
    operators/mix.py), and per-stratum TOKEN budgets (distributed
    hash-range-bucket prefix sum — the unit real mixes are specified
    in).  Membership derives from md5(seed:id), so DuckDB replays the
    identical sample."""
    from partitioned_ef_ans_spark.operators import mix as m_mod
    from partitioned_ef_ans_spark.operators import sampling as s_mod

    docs = _docs(spark, sf_dir)
    a = s_mod.stratified_sample(
        docs, SAMPLE_RATES, seed=_SAMPLE_SEED
    ).select(F.lit("rate").alias("mode"), "doc_id", "lang")
    b = s_mod.stratified_cap(
        docs, SAMPLE_CAPS, seed=_SAMPLE_SEED
    ).select(F.lit("cap").alias("mode"), "doc_id", "lang")
    ev = docs.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    c = m_mod.training_mix(
        docs, ev, SAMPLE_RATES, quality_min=_MIX_QUALITY_MIN,
        n=_DECONTAM_N, max_overlap=_MIX_MAX_OVERLAP, seed=_SAMPLE_SEED,
    ).select(F.lit("mix").alias("mode"), "doc_id", "lang")
    d = s_mod.stratified_token_budget(
        docs, SAMPLE_BUDGETS, seed=_SAMPLE_SEED
    ).select(F.lit("tokcap").alias("mode"), "doc_id", "lang")
    return a.unionByName(b).unionByName(c).unionByName(d)


def sql_stratified_sample() -> str:
    from partitioned_ef_ans_spark.operators.sampling import (
        HASH_SPACE,
        duckdb_sample_hash,
    )

    hv = duckdb_sample_hash("doc_id", _SAMPLE_SEED)
    # identical integer thresholds to the Spark side: int(rate * 2^60)
    rate_case = "CASE lang " + " ".join(
        f"WHEN '{s}' THEN CAST({int(r * HASH_SPACE)} AS BIGINT)"
        for s, r in sorted(SAMPLE_RATES.items())
    ) + " ELSE CAST(0 AS BIGINT) END"
    cap_langs = ", ".join(f"'{s}'" for s in sorted(SAMPLE_CAPS))
    cap_case = "CASE lang " + " ".join(
        f"WHEN '{s}' THEN {c}" for s, c in sorted(SAMPLE_CAPS.items())
    ) + " END"
    # the mix CTE joins ded(d) with h — qualify the stratum column
    rate_case2 = "CASE d.lang " + " ".join(
        f"WHEN '{s}' THEN CAST({int(r * HASH_SPACE)} AS BIGINT)"
        for s, r in sorted(SAMPLE_RATES.items())
    ) + " ELSE CAST(0 AS BIGINT) END"
    stop = ", ".join(f"'{s}'" for s in t_mod.STOPWORDS)
    budget_langs = ", ".join(f"'{s}'" for s in sorted(SAMPLE_BUDGETS))
    budget_case = "CASE lang " + " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in sorted(SAMPLE_BUDGETS.items())
    ) + " END"
    return f"""
WITH h AS (SELECT doc_id, lang, {hv} AS hv FROM documents),
rate AS (SELECT 'rate' AS mode, doc_id, lang FROM h WHERE hv < {rate_case}),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS r
  FROM h WHERE lang IN ({cap_langs})
),
cap AS (SELECT 'cap' AS mode, doc_id, lang FROM ranked WHERE r <= {cap_case}),
t AS (SELECT doc_id, lang, text, {_TOKS} AS w FROM documents),
qual AS (
  SELECT doc_id FROM (
    SELECT doc_id, CAST(len(w) AS DOUBLE) AS n,
           CAST(len(list_filter(w, x -> x IN ({stop}))) AS DOUBLE) AS st
    FROM t)
  WHERE round(1.0 / (1.0 + exp(-(0.01 * n -
        2.0 * (CASE WHEN n > 0 THEN st / n ELSE 0.0 END)))), 6)
        >= {_MIX_QUALITY_MIN}
),
ded AS (
  SELECT doc_id, lang, w FROM (
    SELECT t.doc_id, t.lang, t.w,
           min(t.doc_id) OVER (PARTITION BY sha256(t.text)) AS can
    FROM t JOIN qual USING (doc_id))
  WHERE doc_id = can
),
dsh AS (SELECT DISTINCT doc_id, w[i+1]||' '||w[i+2]||' '||w[i+3] AS shingle
        FROM ded, UNNEST(range(len(w)-2)) u(i) WHERE len(w) >= 3),
ev AS (SELECT doc_id AS eval_id, w FROM t WHERE doc_id % {_EVAL_MOD} = 0),
esh AS (SELECT DISTINCT eval_id, shingle FROM (
          SELECT eval_id, w[i+1]||' '||w[i+2]||' '||w[i+3] AS shingle
          FROM ev, UNNEST(range(len(w)-2)) u(i) WHERE len(w) >= 3)),
sizes AS (SELECT eval_id, count(*) AS eval_ngrams FROM esh GROUP BY eval_id),
dirty AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, eval_id, count(*) AS n_hit
    FROM dsh JOIN esh USING (shingle) GROUP BY 1, 2) h
  JOIN sizes USING (eval_id)
  WHERE round(n_hit * 1.0 / eval_ngrams, 6) >= {_MIX_MAX_OVERLAP}
),
mix AS (
  SELECT 'mix' AS mode, d.doc_id, d.lang
  FROM ded d JOIN h USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty) AND h.hv < {rate_case2}
),
cum AS (
  SELECT t.doc_id, t.lang,
         sum(CAST(len(t.w) AS BIGINT)) OVER (
           PARTITION BY t.lang ORDER BY h.hv, t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM t JOIN h USING (doc_id) WHERE t.lang IN ({budget_langs})
),
tokcap AS (SELECT 'tokcap' AS mode, doc_id, lang FROM cum
           WHERE c <= {budget_case})
SELECT * FROM rate UNION ALL SELECT * FROM cap
UNION ALL SELECT * FROM mix UNION ALL SELECT * FROM tokcap"""


TRAINING_QUERIES = {
    "events_windowed": q_events_windowed,
    "events_sessions": q_events_sessions,
    "corpus_sha": q_corpus_sha,
    "transform_queries": q_transform_queries,
    "transform_queries_uids": q_transform_queries_uids,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
    "token_counts": q_token_counts,
    "quality_score": q_quality_score,
    "repetition_signals": q_repetition_signals,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_fingerprint,
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "minhash_lsh_pairs": q_minhash_lsh,
    "neardup_clusters": q_neardup_clusters,
    "simhash": q_simhash,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_bucketed": q_embedding_neardup_bucketed,
    "ann_cosine_topk": q_ann_topk,
    "ann_ivf_family_topk": q_ann_ivf_family,
    "hybrid_rrf_topk": q_hybrid_rrf,
    "decontaminate": q_decontaminate,
    "stratified_sample": q_stratified_sample,
}

TRAINING_ORACLES = {
    "events_windowed": sql_events_windowed(),
    "events_sessions": sql_events_sessions(),
    "corpus_sha": sql_corpus_sha(),
    # transform_queries: hashed via the pinned stem table (DuckDB has
    # no Porter stemmer; functions/stem_fixture.py is pytest-locked to
    # a live recomputation over the actual corpus vocabulary)
    "transform_queries": sql_transform_queries(),
    "transform_queries_uids": sql_transform_queries_uids(),
    "multimodal_meta": sql_multimodal_meta(),
    "multimodal_features": sql_multimodal_features(),
    "token_counts": sql_token_counts(),
    "quality_score": sql_quality_score(),
    "repetition_signals": sql_repetition_signals(),
    "lang_id": sql_lang_id(),
    "doc_fingerprint": sql_fingerprint(),
    "exact_dedup": sql_exact_dedup(),
    "ngram_jaccard_pairs": sql_ngram_jaccard(),
    "minhash_lsh_pairs": sql_minhash_lsh(),
    "neardup_clusters": sql_neardup_clusters(),
    "simhash": sql_simhash(),
    "embedding_neardup": sql_embedding_neardup(),
    "embedding_neardup_bucketed": sql_embedding_neardup(),
    "ann_cosine_topk": sql_ann_topk(),
    "ann_ivf_family_topk": sql_ann_ivf_family(),
    "hybrid_rrf_topk": sql_hybrid_rrf(),
    "decontaminate": sql_decontaminate(),
    "stratified_sample": sql_stratified_sample(),
}
