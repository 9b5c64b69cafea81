"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns
with a metadata struct; the Spark-side plumbing (schema, Arrow batch
shape, partition sizing) is real and tested, while the actual media
decode is STUBBED (the codec libraries are not in this container):

- :func:`attach_payload` — pack a binary payload column + metadata
  (real: here the payload is utf-8 text bytes, standing in for media).
- :func:`extract_meta` — pure-Catalyst metadata extraction (byte
  length, sha256) — oracle-checked.
- :func:`decode_features` — mapInPandas feature extractor with the
  real UDF signature/batching; produces a deterministic fake feature
  vector from the payload hash, and raises NotImplementedError when
  ``strict=True`` to mark where a real decoder (PIL/ffmpeg) plugs in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_payload(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, modality, payload binary, meta struct)."""
    return documents.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def extract_meta(payloads: DataFrame) -> DataFrame:
    """(doc_id, modality, n_bytes, sha) — JVM-side, oracle-checked."""
    return payloads.select(
        "doc_id",
        "modality",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha"),
    )


def decode_features(payloads: DataFrame, strict: bool = False) -> DataFrame:
    """(doc_id, features array<float>) via Arrow-batched mapInPandas.

    STUB: features = FEATURE_DIM floats derived from the payload's
    sha bytes (deterministic).  With ``strict=True`` raises
    NotImplementedError — the marked seam where a real image/audio
    decoder goes; batch shape, schema and partitioning are the real
    production plumbing either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if strict:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg — not in this container"
            )
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p)).digest()
                arr = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4")
                feats.append((arr.astype(np.float64) / 2**32).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    from partitioned_ef_ans_spark.session import ship_package

    ship_package(payloads.sparkSession)
    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, features array<float>"
    )
