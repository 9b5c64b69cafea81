"""Local replica of the driver's Spark-vs-DuckDB compare."""

from __future__ import annotations

import duckdb
import pandas as pd


TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    # float normalization: hash-compare rounds at display precision
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
    return pdf


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_conn(sf_dir)
    oracle = con.execute(sql).df()
    got = spark_df.toPandas()
    if sorted(got.columns) != sorted(oracle.columns):
        return False, f"columns differ: spark={sorted(got.columns)} duck={sorted(oracle.columns)}"
    a, b = normalize(got), normalize(oracle)
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} duck={len(b)}"
    a = a.astype(str).reset_index(drop=True)
    b_ = b.astype(str).reset_index(drop=True)
    neq = (a != b_).any(axis=1)
    if neq.any():
        i = int(neq.idxmax())
        return False, f"first mismatch row {i}:\nspark={a.iloc[i].to_dict()}\nduck ={b_.iloc[i].to_dict()}"
    return True, "ok"
