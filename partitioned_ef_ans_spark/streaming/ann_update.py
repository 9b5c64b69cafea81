"""Streaming embeddings -> live ANN store: micro-batches append into a
persisted IVF index via O(batch) maintenance.

The dense-retrieval twin of :mod:`.index_update` (streaming corpus ->
text index): embedding rows land in a directory, each micro-batch calls
``index/ann_store.py::add_vectors`` (assignment to the FROZEN centroids
plus twin-table appends — models are never retrained by the stream, by
the store's LSM contract), and the store stays queryable between
batches.  Exactly-once effect on the store: the file-source checkpoint
makes delivery at-least-once, and ``skip_existing=True`` makes replayed
ids a no-op filter (vec_ids are unique by contract), the ANN edition of
the text updater's ``skip_stale``.

Reference parity note: the reference engine is batch-only and has no
ANN plane; this is brief-driven (training-data pipeline over streams),
reusing the reference's build/verify lifecycle vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

#: file-source schema for streamed embedding rows
ANN_STREAM_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)


def start_ann_update_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    engine: str = "np",
):
    """File-source stream of (vec_id, embedding) rows; each micro-batch
    is appended to the ANN store at ``store_dir`` (which must exist —
    build it with ``build_ann_index`` first, possibly on a seed
    corpus).  Appends are O(batch) under the frozen centroids /
    codebooks; run ``compact_ann_index`` / a rebuild out-of-band when
    the corpus has drifted enough to deserve retrained models."""
    from partitioned_ef_ans_spark.index.ann_store import add_vectors

    src = spark.readStream.schema(ANN_STREAM_SCHEMA).parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        res = add_vectors(
            spark, store_dir, batch_df, engine=engine, skip_existing=True
        )
        n_deferred = int(res.get("skipped_tombstoned", 0))
        if n_deferred:
            # a tombstoned id in the batch is a RE-ADD of a deleted
            # vector: it cannot land while the old row physically
            # exists, so it is deferred until compaction — surfaced
            # here instead of silently dropped
            import sys

            print(
                f"ann_update batch {batch_id}: {n_deferred} tombstoned "
                "ids skipped (re-add deferred until compaction)",
                file=sys.stderr,
            )

    writer = src.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()
