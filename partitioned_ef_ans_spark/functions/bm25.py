"""BM25 scoring — float32, constants and formulas per the reference.

Reference (bm25.hpp:7-25):
  k1 = 1.2, b = 0.5
  doc_term_weight(f, norm_len) = f / (f + k1*(1 - b + b*norm_len))
  query_term_weight(qtf, df, N) = qtf * max(1e-6, ln((N - df + 0.5)/(df + 0.5))) * (1 + k1)

Two implementations with the same constants:

- NumPy float32 kernels (used inside the index/query UDFs) — these
  reproduce the reference's float arithmetic so compressed-path scores
  are rank-identical to the exhaustive oracle computed with the same
  kernels (SURVEY.md §7 exactness target b).
- Spark Column expressions in double (used by the pure-DataFrame
  oracle that is cross-checked against DuckDB SQL; both sides round to
  ROUND_DECIMALS before comparison, absorbing double-vs-float drift).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.5
EPSILON_SCORE = 1.0e-6

#: decimals used when comparing DataFrame scores against the DuckDB oracle.
#: 7 keeps discrimination for epsilon-idf scores (~1e-6, stopword-like
#: terms) while sitting ~1e9 above double summation-order noise.
ROUND_DECIMALS = 7


# ---------------------------------------------------------------- numpy f32

def doc_term_weight_np(freqs: np.ndarray, norm_len: np.float32) -> np.ndarray:
    """Vectorized float32 doc-side weight for one document's tf values."""
    f = freqs.astype(np.float32, copy=False)
    k1 = np.float32(K1)
    denom = f + k1 * (np.float32(1.0) - np.float32(B) + np.float32(B) * norm_len)
    return f / denom


def query_term_weight_np(qtf: int, df: int, num_docs: int) -> np.float32:
    idf = np.float32(
        np.log((np.float32(num_docs) - np.float32(df) + np.float32(0.5)) / (np.float32(df) + np.float32(0.5)))
    )
    idf = max(np.float32(EPSILON_SCORE), idf)
    return np.float32(qtf) * idf * (np.float32(1.0) + np.float32(K1))


def doc_term_weight_vec(freqs: np.ndarray, norm_lens: np.ndarray) -> np.ndarray:
    """Elementwise float32 weight for aligned (tf, norm_len) arrays."""
    f = freqs.astype(np.float32, copy=False)
    nl = norm_lens.astype(np.float32, copy=False)
    k1 = np.float32(K1)
    return f / (f + k1 * (np.float32(1.0 - B) + np.float32(B) * nl))


# ------------------------------------------------------------ spark columns

def doc_term_weight_col(tf: Column, norm_len: Column) -> Column:
    f = tf.cast("double")
    return f / (f + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * norm_len.cast("double")))


def query_term_weight_col(qtf: Column, df: Column, num_docs: Column) -> Column:
    idf = F.log(
        (num_docs.cast("double") - df.cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
    )
    return qtf.cast("double") * F.greatest(F.lit(float(EPSILON_SCORE)), idf) * F.lit(1.0 + K1)


#: the identical formulas as DuckDB SQL fragments (oracle side).
DUCKDB_DOC_TERM_WEIGHT = (
    "(CAST(tf AS DOUBLE) / (CAST(tf AS DOUBLE) + {k1} * ({one_minus_b} + {b} * norm_len)))"
)
DUCKDB_QUERY_TERM_WEIGHT = (
    "(CAST(qtf AS DOUBLE) * GREATEST({eps}, LN((CAST(num_docs AS DOUBLE) - df + 0.5) / (df + 0.5))) * {one_plus_k1})"
)


def duckdb_doc_term_weight(tf: str = "tf", norm_len: str = "norm_len") -> str:
    return (
        f"(CAST({tf} AS DOUBLE) / (CAST({tf} AS DOUBLE) + {K1} * "
        f"({1.0 - B} + {B} * {norm_len})))"
    )


def duckdb_query_term_weight(qtf: str = "qtf", df: str = "df", num_docs: str = "num_docs") -> str:
    return (
        f"(CAST({qtf} AS DOUBLE) * GREATEST({EPSILON_SCORE}, "
        f"LN((CAST({num_docs} AS DOUBLE) - {df} + 0.5) / ({df} + 0.5))) * {1.0 + K1})"
    )
