"""CLI surface for the persisted ANN index (``ann build / query /
add / verify``): the full lifecycle driven through cli.main() must
produce exactly the library results (the CLI is dispatch, not logic)."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.test_cli import run_cli_inproc as run_cli

#: the CLI ANN tests use the sf0.01 embeddings (500 x 64) — sf0.001 has
#: no embeddings table small enough to exercise multi-bucket probing
SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def query_parquet(tmp_path_factory):
    import pyarrow as pa

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    sl = tbl.slice(0, 5)
    out = str(tmp_path_factory.mktemp("annq") / "queries.parquet")
    pq.write_table(
        pa.table({"query_id": sl["vec_id"], "embedding": sl["embedding"]}),
        out,
    )
    return out


def test_cli_ann_lifecycle(spark, tmp_path, query_parquet):
    from partitioned_ef_ans_spark.index import ann_store
    from partitioned_ef_ans_spark.operators import ann

    store = str(tmp_path / "annstore")
    man_line = run_cli(
        "ann", "build", "--index", store,
        "--embeddings", f"{SF}/embeddings.parquet",
        "--n-centroids", "8", "--pinned",
    )
    man = json.loads(man_line)
    assert man["n_vectors"] == 500 and man["trained"] is False

    ver = json.loads(run_cli("ann", "verify", "--index", store))
    assert ver["ok"], ver

    out = run_cli(
        "ann", "query", "--index", store, "--queries", query_parquet,
        "-k", "5", "--nprobe", "2",
    )
    lines = [ln.split("\t") for ln in out.strip().splitlines()]
    assert len(lines) == 25  # 5 queries x top-5

    # CLI output == library result, row for row
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = spark.read.parquet(query_parquet)
    want = ann.ivf_dense_topk(qv, embs, k=5, n_centroids=8, nprobe=2)
    want_rows = [
        (str(r["query_id"]), str(r["rank"]), str(r["doc_id"]), str(r["cos"]))
        for r in want.orderBy("query_id", "rank").collect()
    ]
    assert [tuple(ln) for ln in lines] == want_rows

    # append a shifted copy of 10 vectors (fresh ids), re-verify, and
    # the appended ids become servable
    new = (
        embs.orderBy("vec_id").limit(10)
        .select((F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
                "embedding")
    )
    new_path = str(tmp_path / "new_embs.parquet")
    new.write.parquet(new_path)
    man2 = json.loads(run_cli(
        "ann", "add", "--index", store, "--embeddings", new_path,
    ))
    assert man2["n_vectors"] == 510
    ver2 = json.loads(run_cli("ann", "verify", "--index", store))
    assert ver2["ok"], ver2
    idx = ann_store.load_ann_index(spark, store)
    assert idx.assignments.where(F.col("vec_id") >= 1_000_000).count() == 10

    # delete the appended ids -> masked from serving immediately;
    # compact folds them physically and frees the id range
    dead = " ".join(str(1_000_000 + i) for i in range(10))
    dinfo = json.loads(run_cli(
        "ann", "delete", "--index", store, "--ids", dead,
    ))
    assert dinfo["tombstones_total"] == 10
    ver3 = json.loads(run_cli("ann", "verify", "--index", store))
    assert ver3["ok"], ver3
    out2 = run_cli(
        "ann", "query", "--index", store, "--queries", query_parquet,
        "-k", "5", "--nprobe", "8",
    )
    assert not any(
        int(ln.split("\t")[2]) >= 1_000_000
        for ln in out2.strip().splitlines()
    )
    cinfo = json.loads(run_cli("ann", "compact", "--index", store))
    assert cinfo["removed"] == 10 and cinfo["n_vectors"] == 500
    ver4 = json.loads(run_cli("ann", "verify", "--index", store))
    assert ver4["ok"], ver4
    rinfo = json.loads(run_cli("ann", "repair", "--index", store))
    assert rinfo["n_vectors"] == 500 and rinfo["n_tombstones"] == 0


def test_cli_ann_arg_validation(tmp_path):
    from partitioned_ef_ans_spark import cli

    rc = cli.main(["ann", "build", "--index", str(tmp_path / "x")])
    assert rc == 2
    rc = cli.main(["ann", "query", "--index", str(tmp_path / "x")])
    assert rc == 2
    rc = cli.main(["ann", "delete", "--index", str(tmp_path / "x")])
    assert rc == 2


def test_cli_hybrid_serves_persisted_fusion(spark, tmp_path):
    """CLI ``hybrid``: persisted text index + persisted ANN store,
    RRF-fused — output equals the library composition row for row."""
    from partitioned_ef_ans_spark.index import ann_store
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
    )
    from partitioned_ef_ans_spark.operators import hybrid as h_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx_dir = str(tmp_path / "idx")
    store = str(tmp_path / "store")
    build_index_resumable(
        spark, docs.select("doc_id", "text"), idx_dir, codec="ans",
        num_parts=4, chunk_postings=2048,
    )
    ann_store.build_ann_index(
        spark, embs, store, n_centroids=8, trained=False, sq8=False,
        engine="np", source=f"{SF}/embeddings.parquet",
    )
    qs = [(0, ["spark", "join"]), (5, ["dup"])]
    stdin = "\n".join(f"{q}\t{' '.join(t)}" for q, t in qs) + "\n"
    out = run_cli(
        "hybrid", "--index", idx_dir, "--store", store,
        "-k", "5", "--nprobe", "2", stdin=stdin,
    )
    got = [tuple(ln.split("\t")) for ln in out.strip().splitlines()]
    qv = embs.where(F.col("vec_id").isin([0, 5])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = h_mod.hybrid_search_persisted(
        spark, idx_dir, store, queries_to_df(spark, qs), qv, embs,
        k=5, nprobe=2,
    )
    want_rows = [
        (str(r["query_id"]), str(r["rank"]), str(r["doc_id"]), str(r["rrf"]))
        for r in want.orderBy("query_id", "rank").collect()
    ]
    assert got == want_rows and len(got) == 10


def test_cli_ann_sharded_query_and_merge(spark, tmp_path, query_parquet):
    """`ann query --index a,b` scatter-gathers; `ann merge --index dst
    --from src` folds live source vectors — both must equal the
    library calls row for row."""
    from partitioned_ef_ans_spark.index import ann_store

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    dirs = []
    for p in (0, 1):
        d = str(tmp_path / f"shard{p}")
        ann_store.build_ann_index(
            spark, embs.where(F.col("vec_id") % 2 == p), d, n_centroids=8,
            trained=False, sq8=False, engine="np",
        )
        dirs.append(d)
    out = run_cli(
        "ann", "query", "--index", ",".join(dirs),
        "--embeddings", f"{SF}/embeddings.parquet",
        "--queries", query_parquet, "-k", "5", "--nprobe", "8",
    )
    got = sorted(
        tuple(ln.split("\t")) for ln in out.strip().splitlines()
    )
    qv = spark.read.parquet(query_parquet)
    want = sorted(
        (str(r["query_id"]), str(r["rank"]), str(r["doc_id"]), str(r["cos"]))
        for r in ann_store.query_sharded_ann(
            spark, dirs, qv, embs, k=5, nprobe=8
        ).collect()
    )
    assert got == want

    man_line = run_cli(
        "ann", "merge", "--index", dirs[0], "--from", dirs[1],
        "--embeddings", f"{SF}/embeddings.parquet",
    )
    assert json.loads(man_line)["n_vectors"] == 500
    ver = json.loads(run_cli("ann", "verify", "--index", dirs[0]))
    assert ver["ok"], ver


def test_cli_sharded_query_unions_per_shard_sources(spark, tmp_path):
    """Shards built beside per-shard embedding tables: `ann query
    --index a,b` without --embeddings must union BOTH recorded
    sources (defaulting to shard 0's would silently drop shard 1's
    candidates at the rescore join)."""
    from partitioned_ef_ans_spark.index import ann_store

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    dirs = []
    for p in (0, 1):
        half_path = str(tmp_path / f"half{p}.parquet")
        embs.where(F.col("vec_id") % 2 == p).write.parquet(half_path)
        d = str(tmp_path / f"shard{p}")
        ann_store.build_ann_index(
            spark, spark.read.parquet(half_path), d, n_centroids=8,
            trained=False, sq8=False, engine="np", source=half_path,
        )
        dirs.append(d)
    qp = str(tmp_path / "q.parquet")
    embs.orderBy("vec_id").limit(3).selectExpr(
        "vec_id AS query_id", "embedding"
    ).write.parquet(qp)
    out = run_cli(
        "ann", "query", "--index", ",".join(dirs), "--queries", qp,
        "-k", "5", "--nprobe", "8",
    )
    got = sorted(tuple(ln.split("\t")) for ln in out.strip().splitlines())
    qv = spark.read.parquet(qp)
    want = sorted(
        (str(r["query_id"]), str(r["rank"]), str(r["doc_id"]), str(r["cos"]))
        for r in ann_store.query_sharded_ann(
            spark, dirs, qv, embs, k=5, nprobe=8
        ).collect()
    )
    assert got == want
    # both parities present in the fused neighbors = shard 1's
    # candidates actually rescored
    assert {int(t[2]) % 2 for t in got} == {0, 1}


def test_cli_ann_neardup_via_store(spark, tmp_path):
    """`ann neardup --index STORE` serves the embedding near-dup pair
    relation from the persisted artifacts and must equal the library
    brute force."""
    from partitioned_ef_ans_spark.index import ann_store
    from partitioned_ef_ans_spark.operators import dedup as d_mod

    store = str(tmp_path / "ndstore")
    ann_store.build_ann_index(
        spark, spark.read.parquet(f"{SF}/embeddings.parquet"), store,
        n_centroids=8, trained=False, sq8=False, engine="np",
        source=f"{SF}/embeddings.parquet",
    )
    out = run_cli("ann", "neardup", "--index", store)
    got = json.loads(out)
    want = d_mod.embedding_neardup_pairs(
        spark.read.parquet(f"{SF}/embeddings.parquet")
    ).count()
    assert got["pairs"] == want
