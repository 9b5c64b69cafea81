"""Resumable index build: per-partition checkpoints, lineage, metrics.

The reference's build is one monolithic process; at 10^12-file scale a
build must survive preemption.  Strategy (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"):

1. STAGE    — tokenize -> chunked postings written once as a parquet
              staging table partitioned by ``part_id = crc32(term) %
              num_parts`` (idempotent: skipped when _SUCCESS exists).
              Doc stats + frozen ANS models are also staged once.
2. ENCODE   — one Spark job per *incomplete* part encodes that part's
              chunks into ``index.parquet/part=<id>/``; on success a
              line is appended to ``checkpoints.jsonl`` carrying the
              part's lineage fingerprint (rows, postings, xor of term
              hashes — recomputable from staging) + byte/time metrics.
3. RESUME   — a rerun reads checkpoints.jsonl and skips completed
              parts; a part whose lineage fingerprint no longer matches
              staging is re-encoded (input drift protection).

Failure injection for tests: ``fail_after_parts`` raises mid-build;
the rerun completes the remainder without re-encoding finished parts.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.index import build as b_mod
from partitioned_ef_ans_spark.operators import doc_stats as ds_mod
from partitioned_ef_ans_spark.operators import postings as p_mod
from partitioned_ef_ans_spark.tokenizer import term_frequencies, tokenize


class BuildInterrupted(RuntimeError):
    pass


def _lineage(spark: SparkSession, staged: DataFrame, part_id: int) -> dict:
    row = (
        staged.where(F.col("part_id") == part_id)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.size("doc_ids")).alias("postings"),
            F.sum(F.crc32(F.col("term"))).alias("term_sig"),
        )
        .collect()[0]
    )
    return {
        "rows": int(row["rows"] or 0),
        "postings": int(row["postings"] or 0),
        "term_sig": int(row["term_sig"] or 0),
    }


def build_index_resumable(
    spark: SparkSession,
    corpus_docs: DataFrame,
    out_dir: str,
    codec: str = "ans",
    num_parts: int = 8,
    chunk_postings: int = p_mod.DEFAULT_CHUNK_POSTINGS,
    doc_col: str = "doc_id",
    text_col: str = "text",
    fail_after_parts: int | None = None,
) -> dict:
    from partitioned_ef_ans_spark.session import ship_package

    ship_package(spark)
    os.makedirs(out_dir, exist_ok=True)
    staging = f"{out_dir}/staging_postings.parquet"
    ckpt_path = f"{out_dir}/checkpoints.jsonl"
    t0 = time.perf_counter()

    # staging written by a pre-doc_lens version of this module cannot
    # be resumed (the encode pass unpacks chunk-local doc_lens):
    # invalidate it and its checkpoints instead of failing mid-encode
    if os.path.exists(f"{staging}/_SUCCESS"):
        if "doc_lens" not in spark.read.parquet(staging).columns:
            import shutil

            shutil.rmtree(staging)
            if os.path.exists(ckpt_path):
                os.remove(ckpt_path)

    # ---- stage 1: postings + stats + models (idempotent)
    if not os.path.exists(f"{staging}/_SUCCESS"):
        tokens = tokenize(corpus_docs, doc_col=doc_col, text_col=text_col)
        tf = term_frequencies(tokens).cache()
        stats = ds_mod.build_doc_stats(
            corpus_docs.select(F.col(doc_col).alias("doc_id")),
            tf.select("doc_id", "term", "tf"),
        )
        stats.write.mode("overwrite").parquet(f"{out_dir}/doc_stats.parquet")
        stats_df = spark.read.parquet(f"{out_dir}/doc_stats.parquet")
        num_docs = stats_df.count()
        postings = p_mod.build_postings(
            tf, num_docs=num_docs, chunk_postings=chunk_postings,
            doc_norms=stats_df,
        ).withColumn("part_id", F.crc32(F.col("term")) % num_parts)
        postings.write.mode("overwrite").partitionBy("part_id").parquet(staging)
        tf.unpersist()

    staged = spark.read.parquet(staging)
    # doc_lens ride inside the staged chunks; the driver only needs
    # the scalars (num_docs, avg_len) — no num_docs-sized collect
    srow = (
        spark.read.parquet(f"{out_dir}/doc_stats.parquet")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avg"))
        .collect()[0]
    )
    num_docs = int(srow["n"])
    avg_len = float(srow["avg"] or 0.0)

    models_path = f"{out_dir}/models.pkl"
    if not os.path.exists(models_path):
        import pickle

        if codec in b_mod.ANS_CODEC_VARIANTS:
            models = b_mod.train_ans_models(
                staged, variant=b_mod.ANS_CODEC_VARIANTS[codec]
            )
        elif codec == "ans_packed":
            models = b_mod.train_ans_packed_models(staged)
        else:
            models = None
        with open(models_path, "wb") as fh:
            pickle.dump({"codec": codec, "models": models}, fh)
    else:
        import pickle

        with open(models_path, "rb") as fh:
            models = pickle.load(fh)["models"]

    codec_bundle = b_mod.IndexCodec(codec, models, num_docs=num_docs)
    codec_bc = spark.sparkContext.broadcast(codec_bundle)

    # ---- stage 2: per-part encode with checkpoints
    done: dict[int, dict] = {}
    if os.path.exists(ckpt_path):
        with open(ckpt_path) as fh:
            for line in fh:
                rec = json.loads(line)
                done[rec["part_id"]] = rec

    encoded_parts = 0
    skipped = 0
    for part_id in range(num_parts):
        lin = _lineage(spark, staged, part_id)
        prev = done.get(part_id)
        if prev and all(prev["lineage"][k] == lin[k] for k in lin):
            skipped += 1
            continue
        t_part = time.perf_counter()
        part_df = staged.where(F.col("part_id") == part_id).drop("part_id")
        out_path = f"{out_dir}/index.parquet/part={part_id}"
        part_df.mapInPandas(
            b_mod._encode_factory(codec_bc, avg_len), schema=b_mod.INDEX_SCHEMA
        ).write.mode("overwrite").parquet(out_path)
        stats_row = spark.read.parquet(out_path).agg(
            F.sum("n").alias("postings"), F.sum(F.length("payload")).alias("bytes")
        ).collect()[0]
        rec = {
            "part_id": part_id,
            "lineage": lin,
            "postings": int(stats_row["postings"] or 0),
            "payload_bytes": int(stats_row["bytes"] or 0),
            "elapsed_sec": round(time.perf_counter() - t_part, 3),
            "codec": codec,
        }
        with open(ckpt_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        encoded_parts += 1
        if fail_after_parts is not None and encoded_parts >= fail_after_parts:
            raise BuildInterrupted(f"injected failure after {encoded_parts} parts")

    total = spark.read.parquet(f"{out_dir}/index.parquet")
    # freeze the per-term WAND metadata like the non-resumable build
    total.groupBy("term").agg(
        F.first("df").alias("df"),
        F.first("cf").alias("cf"),
        F.first("num_chunks").alias("num_chunks"),
        F.max("chunk_max_weight").alias("max_term_weight"),
        F.sum("n").alias("postings"),
        F.sum(F.length("payload")).alias("payload_bytes"),
    ).write.mode("overwrite").parquet(f"{out_dir}/term_stats.parquet")
    agg = total.agg(
        F.sum("n").alias("postings"), F.sum(F.length("payload")).alias("bytes")
    ).collect()[0]
    metrics = {
        "codec": codec,
        "num_docs": num_docs,
        "avg_doc_len": avg_len,
        "num_parts": num_parts,
        "parts_encoded_this_run": encoded_parts,
        "parts_skipped_resume": skipped,
        "total_postings": int(agg["postings"] or 0),
        "payload_bytes": int(agg["bytes"] or 0),
        "bits_per_posting": (
            int(agg["bytes"] or 0) * 8 / int(agg["postings"] or 1)
        ),
        "build_sec": round(time.perf_counter() - t0, 3),
        "chunk_postings": chunk_postings,
    }
    with open(f"{out_dir}/manifest.json", "w") as fh:
        json.dump(metrics, fh, indent=2)
    return metrics
