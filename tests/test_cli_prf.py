"""CLI surface for the round-4 retrieval extensions: `queries --prf`
and `queries --collapse-by` must emit exactly what the in-process
operators produce (same index dir, same float32 kernels)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from tests.test_cli import run_cli_inproc as run_cli
from tests.test_deletes import N_DOCS, _corpus

QUERY = "w00 w03"


@pytest.fixture(scope="module")
def cli_prf_env(spark):
    base = f"/dev/shm/pefa_cli_prf_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    corpus = f"{base}/corpus.parquet"
    pdf = pd.DataFrame(_corpus(range(N_DOCS)), columns=["doc_id", "text"])
    pdf["src"] = "s" + (pdf.doc_id % 3).astype(str)
    pdf.to_parquet(corpus)
    idx = f"{base}/idx"
    run_cli("create_freq_index", "block_ansmsbmedmaxmerged", corpus, idx)
    yield corpus, idx
    shutil.rmtree(base, ignore_errors=True)


def _parse_topk(out):
    rows = []
    for line in out.splitlines():
        parts = line.split("\t")
        if len(parts) == 4:
            q, r, d, s = parts
            rows.append((int(q), int(r), int(d), float(s)))
    return rows


def _load(spark, idx):
    from partitioned_ef_ans_spark.index import build as b_mod

    index_df, _s, ts, codec, man = b_mod.load_index(spark, idx)
    return index_df, ts, codec, man


def test_cli_prf_matches_inprocess(spark, cli_prf_env):
    from partitioned_ef_ans_spark.operators import prf as prf_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    corpus, idx = cli_prf_env
    got = _parse_topk(run_cli(
        "queries", idx, "--prf", "--corpus", corpus, "--print-topk",
        stdin=QUERY + "\n",
    ))
    index_df, ts, codec, man = _load(spark, idx)
    want = [
        (r["query_id"], r["rank"], r["doc_id"], float(r["score"]))
        for r in prf_mod.run_ranked_prf(
            spark, index_df,
            queries_to_df(spark, [(0, QUERY.split())]), codec,
            man["num_docs"], man["avg_doc_len"],
            spark.read.parquet(corpus), k=10, k_fb=5, m=3,
            mode="blockmax", dtype="float32", term_stats_df=ts,
        ).orderBy("rank").collect()
    ]
    assert got == want and len(got) == 10


def test_cli_collapse_matches_inprocess(spark, cli_prf_env):
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    corpus, idx = cli_prf_env
    got = _parse_topk(run_cli(
        "queries", idx, "--collapse-by", "src", "--corpus", corpus,
        "--print-topk", stdin=QUERY + "\n",
    ))
    index_df, ts, codec, man = _load(spark, idx)
    groups = spark.read.parquet(corpus).select(
        "doc_id", F.col("src").alias("grp")
    )
    want = [
        (r["query_id"], r["rank"], r["doc_id"], float(r["score"]))
        for r in q_mod.run_ranked_collapsed(
            spark, index_df,
            queries_to_df(spark, [(0, QUERY.split())]), codec,
            man["num_docs"], man["avg_doc_len"], groups, k=10,
            term_stats_df=ts,
        ).orderBy("rank").collect()
    ]
    assert got == want and len(got) == 3  # one per src group


def test_cli_fuzzy_matches_inprocess(spark, cli_prf_env):
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.operators.spellcheck import (
        run_ranked_fuzzy,
    )

    _corpus_path, idx = cli_prf_env
    # query 0 has a correctable typo; query 1 is unresolvable -> drops
    got = _parse_topk(run_cli(
        "queries", idx, "--fuzzy", "--print-topk",
        stdin="w0q w03\nzzz zzzz\n",
    ))
    index_df, ts, codec, man = _load(spark, idx)
    want = [
        (r["query_id"], r["rank"], r["doc_id"], float(r["score"]))
        for r in run_ranked_fuzzy(
            spark, index_df,
            queries_to_df(
                spark, [(0, ["w0q", "w03"]), (1, ["zzz", "zzzz"])]
            ),
            codec, man["num_docs"], man["avg_doc_len"],
            term_stats_df=ts, mode="blockmax", k=10, dtype="float32",
        ).orderBy("query_id", "rank").collect()
    ]
    assert got == want and len(got) == 10
    assert {q for q, *_ in got} == {0}


def test_cli_prf_flag_validation():
    import subprocess
    import sys

    from tests.test_cli import ENV, REPO

    r = subprocess.run(
        [sys.executable, "-m", "partitioned_ef_ans_spark.cli",
         "queries", "/nonexistent", "--prf"],
        input="w00\n", capture_output=True, text=True, cwd=REPO, env=ENV,
        timeout=120,
    )
    assert r.returncode == 1 and "--corpus" in r.stderr
