"""partitioned_ef_ans_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first rebuild of the capabilities of
mpetri/partitioned_ef_ans (partitioned Elias-Fano + ANS compressed
inverted indexes with WAND/MaxScore top-k BM25 retrieval).  The
reference (at /root/reference, cited as ``file:line`` in docstrings)
defines WHAT is computed; the architecture here is idiomatic PySpark:

- build plane = DataFrame jobs (tokenize -> postings agg -> model agg ->
  broadcast models -> encode -> parquet), shuffles only at groupBy/term
  boundaries, skew handled by explicit salting;
- codecs (vbyte / Elias-Fano / partitioned-EF DP / ANS-MSB) = NumPy
  kernels inside Arrow-batched pandas UDFs (never per-row Python);
- query plane = broadcast query set + doc stats, per-partition top-k
  inside vectorized UDFs, merged globally (top-k is a commutative
  monoid), with a pure-DataFrame exhaustive BM25 oracle.
"""

__version__ = "0.1.0"

from partitioned_ef_ans_spark.session import get_spark  # noqa: F401
