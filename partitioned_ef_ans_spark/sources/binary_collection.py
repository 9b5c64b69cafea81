"""Reference binary-collection format: read/write `.docs/.freqs/.sizes`.

Format (README.md:79-101, binary_collection.hpp:13-160): each file is
a sequence of length-prefixed u32-LE sequences; ``.docs`` begins with a
singleton sequence holding num_docs; term-id = ordinal position of the
(docs, freqs) pair; ``.sizes`` is one sequence of num_docs lengths.

These adapters make the Spark engine interoperable with corpora
prepared for the reference: ``read_collection`` -> postings DataFrame,
``write_collection`` <- postings DataFrame (so the reference binary
could consume our output), plus the query-file reader
(queries.hpp:15-28: one whitespace-separated term-id line per query).
Files are single-node artifacts (the reference mmaps them); at scale
they are an exchange format, not the working representation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _read_sequences(path: str):
    buf = np.fromfile(path, dtype="<u4")
    pos = 0
    out = []
    while pos < len(buf):
        n = int(buf[pos])
        pos += 1
        out.append(buf[pos : pos + n])
        pos += n
    return out


def read_collection(spark: SparkSession, basename: str) -> tuple[DataFrame, DataFrame, int]:
    """-> (postings df: term_id, doc_ids, freqs; sizes df: doc_id,
    doc_len; num_docs)."""
    docs_seqs = _read_sequences(f"{basename}.docs")
    freq_seqs = _read_sequences(f"{basename}.freqs")
    header = docs_seqs[0]
    assert len(header) == 1, "missing num_docs singleton header"
    num_docs = int(header[0])
    docs_seqs = docs_seqs[1:]
    assert len(docs_seqs) == len(freq_seqs)
    rows = [
        (t, d.astype(np.int64).tolist(), f.astype(np.int32).tolist())
        for t, (d, f) in enumerate(zip(docs_seqs, freq_seqs))
    ]
    postings = spark.createDataFrame(
        rows, "term_id long, doc_ids array<long>, freqs array<int>"
    )
    sizes_seqs = _read_sequences(f"{basename}.sizes")
    sizes = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(sizes_seqs[0])], "doc_id long, doc_len long"
    )
    return postings, sizes, num_docs


def write_collection(
    postings_rows: list[tuple[np.ndarray, np.ndarray]],
    sizes: np.ndarray,
    num_docs: int,
    basename: str,
) -> None:
    """Inverse of read_collection (driver-side exchange writer).

    postings_rows must be ordered by term_id.
    """
    with open(f"{basename}.docs", "wb") as fd, open(f"{basename}.freqs", "wb") as ff:
        np.array([1, num_docs], dtype="<u4").tofile(fd)
        for docs, freqs in postings_rows:
            np.concatenate([[len(docs)], docs]).astype("<u4").tofile(fd)
            np.concatenate([[len(freqs)], freqs]).astype("<u4").tofile(ff)
    with open(f"{basename}.sizes", "wb") as fs:
        np.concatenate([[len(sizes)], sizes]).astype("<u4").tofile(fs)


def read_queries_file(spark: SparkSession, path: str) -> DataFrame:
    """queries.hpp:15-28: one whitespace/tab-separated term-id line per
    query -> (query_id, term_ids array<long>).  Empty lines yield empty
    queries, exactly like the reference parser."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    return (
        lines.withColumn("query_id", F.row_number().over(w) - 1)
        .select(
            "query_id",
            F.filter(
                F.split(F.trim(F.col("value")), "\\s+"), lambda t: t != F.lit("")
            )
            .cast("array<long>")
            .alias("term_ids"),
        )
    )
