"""Stateful streaming exact dedup — `applyInPandasWithState`.

The batch plane's `operators/dedup.py::exact_dedup` (window-min
canonical per sha256) re-expressed as a continuous operator: documents
arrive as micro-batches, per-sha256 group state remembers the
canonical (first-seen, min-within-first-batch) doc_id, and every
document is emitted exactly once with its dedup verdict.  This is the
Spark-native front door for dedup-at-ingest on a 100 TB stream: the
state store shards by sha256 (the same key the batch shuffle uses), so
state lookups never leave the executor that owns the hash range.

Two canonical disciplines:

- ``mode="first_seen"`` (append): the canonical is first-seen (min
  doc_id within the earliest micro-batch containing the hash).  The
  duplicate SET equals batch exact_dedup whenever the earliest copy
  also carries the smallest doc_id (the natural ingest order); the
  batch-equivalence test pins exactly that.
- ``mode="batch_parity"``: the state keeps the RUNNING-MIN canonical
  and the operator emits update-mode corrections — when a smaller
  doc_id arrives late, the demoted old canonical is re-emitted as a
  duplicate with a bumped per-sha ``seq``.  The file sink is
  append-only, so the parquet is a versioned change log; consumers
  (``streaming_dedup_final``) upsert by (sha256, doc_id) on max seq,
  and the finalized table equals batch exact_dedup under ANY —
  including adversarial non-monotone — arrival order.  State stays
  two longs per distinct sha, never a doc list.

Cross-restart state recovery from the checkpoint is pinned for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from partitioned_ef_ans_spark.streaming.ingest import CORPUS_STREAM_SCHEMA

OUTPUT_SCHEMA = (
    "doc_id long, sha256 string, canonical_doc_id long, is_duplicate boolean"
)
STATE_SCHEMA = "canonical_doc_id long"

PARITY_OUTPUT_SCHEMA = OUTPUT_SCHEMA + ", seq long"
PARITY_STATE_SCHEMA = "canonical_doc_id long, seq long"


def _dedup_fn(key, pdf_iter, state):
    import pandas as pd

    canon = state.get[0] if state.exists else None
    docs = []
    for pdf in pdf_iter:
        docs.extend(int(d) for d in pdf["doc_id"])
    docs.sort()
    if not docs:
        yield pd.DataFrame(
            columns=["doc_id", "sha256", "canonical_doc_id", "is_duplicate"]
        )
        return
    if canon is None:
        canon = docs[0]
        state.update((canon,))
    yield pd.DataFrame(
        {
            "doc_id": docs,
            "sha256": key[0],
            "canonical_doc_id": canon,
            "is_duplicate": [d != canon for d in docs],
        }
    )


def _dedup_fn_batch_parity(key, pdf_iter, state):
    """Running-min canonical with update-mode corrections: every batch
    re-asserts the current canonical under a bumped ``seq``; a late
    smaller doc_id demotes the old canonical via an explicit
    correction row, so the max-seq row per (sha, doc_id) always holds
    the final verdict.  State is (canonical, seq) — O(1) per sha."""
    import pandas as pd

    canon, seq = state.get if state.exists else (None, 0)
    docs = []
    for pdf in pdf_iter:
        docs.extend(int(d) for d in pdf["doc_id"])
    docs.sort()
    if not docs:
        yield pd.DataFrame(
            columns=["doc_id", "sha256", "canonical_doc_id", "is_duplicate", "seq"]
        )
        return
    new_canon = docs[0] if canon is None else min(canon, docs[0])
    seq += 1
    out_docs = list(docs)
    if canon is not None and new_canon < canon and canon not in docs:
        out_docs.append(canon)  # correction: old canonical demoted
    state.update((new_canon, seq))
    yield pd.DataFrame(
        {
            "doc_id": out_docs,
            "sha256": key[0],
            "canonical_doc_id": new_canon,
            "is_duplicate": [d != new_canon for d in out_docs],
            "seq": seq,
        }
    )


def start_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    mode: str = "first_seen",
):
    """File-source stream of (doc_id, content) -> per-document dedup
    verdicts appended to ``out_dir``.  State lives in the stream
    checkpoint and survives restarts; re-running after new files land
    continues with the same canonical assignments (exactly-once on the
    file source).

    ``mode="first_seen"``: canonical frozen at first arrival (append
    semantics, one row per doc).  ``mode="batch_parity"``: running-min
    canonical + correction rows (see module docstring); finalize with
    :func:`streaming_dedup_final` for exact batch parity under any
    arrival order."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from partitioned_ef_ans_spark.session import ship_package

    if mode not in ("first_seen", "batch_parity"):
        raise ValueError(f"unknown streaming dedup mode {mode!r}")
    ship_package(spark)
    src = spark.readStream.schema(CORPUS_STREAM_SCHEMA).parquet(input_dir)
    hashed = src.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("sha256")
    )
    fn, out_schema, state_schema = (
        (_dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA)
        if mode == "first_seen"
        else (_dedup_fn_batch_parity, PARITY_OUTPUT_SCHEMA, PARITY_STATE_SCHEMA)
    )
    out = hashed.groupBy("sha256").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()


def streaming_dedup_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def streaming_dedup_final(spark: SparkSession, out_dir: str) -> DataFrame:
    """Finalize a ``batch_parity`` change log: upsert by (sha256,
    doc_id) on max seq, then stamp every row of a sha with that sha's
    surviving canonical (the one doc whose latest row says
    is_duplicate=false).  The result equals batch
    ``operators.dedup.exact_dedup`` verdicts under ANY arrival order."""
    from pyspark.sql.window import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy("sha256", "doc_id").orderBy(F.desc("seq"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    canon = latest.where(~F.col("is_duplicate")).select(
        "sha256", F.col("doc_id").alias("canonical_doc_id")
    )
    return (
        latest.drop("canonical_doc_id", "is_duplicate")
        .join(canon, "sha256")
        .withColumn(
            "is_duplicate", F.col("doc_id") != F.col("canonical_doc_id")
        )
        .select("doc_id", "sha256", "canonical_doc_id", "is_duplicate")
    )
