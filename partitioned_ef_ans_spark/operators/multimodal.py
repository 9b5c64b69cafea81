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
  vector from the payload hash, raises NotImplementedError when
  ``strict=True``, and accepts an injected ``decoder`` callable
  (bytes -> FEATURE_DIM floats) so a real media decoder rides the
  same Arrow plumbing — :func:`pil_image_decoder` builds one from
  Pillow when that library is installed (it is not in this
  container, so the factory is import-guarded and the injection
  path is locked by tests with a genuine non-hash decoder instead).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

# A decoder turns one payload's bytes into FEATURE_DIM float32s.
Decoder = Callable[[bytes], np.ndarray]


def pil_image_decoder(size: tuple[int, int] = (4, 2)) -> Decoder:
    """Real image decoder: PIL open -> grayscale -> resize -> [0,1] floats.

    ``size`` must multiply to FEATURE_DIM.  Import-guarded: Pillow is
    optional and absent from this container — constructing the decoder
    without it raises ImportError with a clear message; the returned
    closure is cloudpickle-safe (workers re-import PIL by module ref).
    """
    if size[0] * size[1] != FEATURE_DIM:
        raise ValueError(f"size {size} must multiply to FEATURE_DIM={FEATURE_DIM}")
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no Pillow
        raise ImportError(
            "pil_image_decoder requires Pillow; install it or inject a "
            "custom decoder into decode_features(decoder=...)"
        ) from exc

    def decode(payload: bytes) -> np.ndarray:  # pragma: no cover - no Pillow here
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L").resize(size)
        return (
            np.asarray(img, dtype=np.float32).reshape(-1)[:FEATURE_DIM] / 255.0
        )

    return decode


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


def decode_features(
    payloads: DataFrame,
    strict: bool = False,
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """(doc_id, features array<float>) via Arrow-batched mapInPandas.

    ``decoder`` (bytes -> FEATURE_DIM float32s) is the real seam: pass
    :func:`pil_image_decoder` (needs Pillow) or any custom callable and
    it runs inside the same Arrow batches.  Without one, the default is
    a deterministic STUB (features from the payload's sha bytes), and
    ``strict=True`` raises NotImplementedError to mark the seam; batch
    shape, schema and partitioning are the production plumbing either
    way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if decoder is None and strict:
            raise NotImplementedError(
                "media decode requires a decoder (e.g. pil_image_decoder; "
                "PIL/ffmpeg are not in this container)"
            )
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if decoder is not None:
                    vec = np.asarray(decoder(bytes(p)), dtype=np.float32).reshape(-1)
                    if vec.shape[0] != FEATURE_DIM:
                        raise ValueError(
                            f"decoder returned {vec.shape[0]} floats, "
                            f"expected {FEATURE_DIM}"
                        )
                    feats.append(vec)
                    continue
                digest = hashlib.sha256(bytes(p)).digest()
                arr = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4")
                feats.append((arr.astype(np.float64) / 2**32).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    from partitioned_ef_ans_spark.session import ship_package

    ship_package(payloads.sparkSession)
    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, features array<float>"
    )
