#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1: measure first).

Complements the FROZEN bench.py with the isolation the optimization
round used: per-leg Spark-JOB counts (the serving-call fixed overhead
bench.py's wall numbers hide), noop-sink timing of the computation
(guide §1.4 — no sink cost, no count() column pruning), stage
decomposition of the composite legs (collapse, prf, docpart), and the
fuzzy candidate-count comparison.  One JSON line ->
BENCH_EXTRA_r06.json.

Usage: python bench_extra.py   (corpus + index reused from bench.py's
/dev/shm artifacts; built here if absent)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("PEFA_BENCH_SYNTH_DOCS", "40000"))
N_QUERIES = int(os.environ.get("PEFA_BENCH_QUERIES", "500"))
K = 10


def noop(df) -> float:
    """Guide §1.4: eager full-column computation, no sink cost."""
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark import corpus as c_mod
    from partitioned_ef_ans_spark.index import blockmax as bmx
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators import prf as prf_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=4 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    import bench as bench_mod

    corpus_path = bench_mod._ensure_bench_corpus(spark, CPUS)
    corpus = spark.read.parquet(corpus_path).withColumnRenamed(
        "content", "text"
    )
    idx_dir = f"/dev/shm/pefa_extra_idx_{SYNTH_DOCS}"
    if not os.path.exists(f"{idx_dir}/manifest.json"):
        b_mod.build_index(
            spark, corpus, idx_dir, codec="ans", doc_col="doc_id",
            text_col="text", chunk_postings=1 << 16,
        )
    index_df, _s, ts, codec, man = b_mod.load_index(spark, idx_dir)
    index_df = index_df.cache(); index_df.count()
    ts = ts.cache(); ts.count()
    qs = c_mod.synthesize_queries(N_QUERIES, vocab_size=20000)
    qdf = queries_to_df(spark, qs).cache(); qdf.count()
    groups = corpus.select(
        "doc_id", F.pmod("doc_id", F.lit(64)).cast("string").alias("grp")
    )

    def last_job() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    out: dict = {}

    def leg(name, fn, reps=2):
        best, jobs = None, None
        for _ in range(reps):
            j0 = last_job()
            sc.setJobDescription(f"bench_extra: {name}")
            dt = noop(fn())
            sc.setJobDescription(None)
            jobs = last_job() - j0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 3), "jobs": jobs}

    for mode in ("blockmax", "maxscore_blockmax", "ranked_or", "taat"):
        leg(f"ranked_{mode}", lambda m=mode: q_mod.run_ranked(
            spark, index_df, qdf, codec, man["num_docs"],
            man["avg_doc_len"], mode=m, k=K, dtype="float32",
            term_stats_df=ts,
        ))
    leg("bool_and", lambda: q_mod.run_boolean(
        spark, index_df, qdf, codec, True, term_stats_df=ts))
    leg("prf_blockmax", lambda: prf_mod.run_ranked_prf(
        spark, index_df, qdf, codec, man["num_docs"], man["avg_doc_len"],
        corpus, k=K, mode="blockmax", dtype="float32", term_stats_df=ts))
    leg("collapse", lambda: q_mod.run_ranked_collapsed(
        spark, index_df, qdf, codec, man["num_docs"], man["avg_doc_len"],
        groups, k=K, term_stats_df=ts))
    leg("blockmax_docpart_100q", lambda: bmx.run_blockmax_docpartitioned(
        spark, index_df, qdf.limit(100), codec, man["num_docs"],
        man["avg_doc_len"], ts, k=K), reps=2)
    leg("gather_blockmax_100q", lambda: q_mod.run_ranked(
        spark, index_df, qdf.limit(100), codec, man["num_docs"],
        man["avg_doc_len"], mode="blockmax", k=K, dtype="float32",
        term_stats_df=ts))

    rec = {
        "metric": "round6_overhead_isolation",
        "value": out["ranked_blockmax"]["sec"],
        "unit": "sec",
        "queries": out,
        "n_queries": N_QUERIES,
        "cpus": CPUS,
        "sf": SF_DIR,
        "synth_docs": SYNTH_DOCS,
        "sink": "noop (guide §1.4)",
        "aggregation": "min of 2 reps per leg; job count from the status tracker",
    }
    with open(Path(__file__).resolve().parent / "BENCH_EXTRA_r06.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
