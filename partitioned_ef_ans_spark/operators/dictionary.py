"""Term dictionary: deterministic dense term-id assignment.

Reference semantics: term-id = ordinal position of the term (line number
in the dictionary file — transform_queries.cpp:71-84); posting lists are
addressed by term-id (README.md:89-97).  We assign ids by global
lexicographic rank of the term string — deterministic, re-derivable.

Scale design: a global ``row_number() OVER (ORDER BY term)`` funnels the
whole vocabulary through one task.  Instead we range-partition by the
order key, count rows per range partition, prefix-sum those counts on
the driver (#partitions values — tiny), and add each partition's offset
to its local rank.  Identical ids, fully parallel, all JVM-side
(SURVEY.md §7 "deterministic id assignment at scale").
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_rank_ids(df: DataFrame, order_cols: list[str], id_col: str) -> DataFrame:
    """Assign dense ids 0..n-1 by the global ordering of ``order_cols``.

    Rows must be unique on ``order_cols``.  Plan: one range shuffle, a
    tiny count job, then a per-range-partition window (each range is one
    window group, so no single-task bottleneck) plus a map-literal
    offset lookup — no Python in the data path.
    """
    num_parts = max(df.rdd.getNumPartitions(), 1)
    keys = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(num_parts, *keys).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.cache()  # pin range boundaries across the two jobs
    counts = ranged.groupBy("__pid").count().collect()
    sizes = {int(r["__pid"]): int(r["count"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_map = F.create_map(
        *chain.from_iterable((F.lit(p), F.lit(o)) for p, o in offsets.items())
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    out = (
        ranged.withColumn("__rank", F.row_number().over(w) - F.lit(1))
        .withColumn(id_col, (offset_map[F.col("__pid")] + F.col("__rank")).cast("long"))
        .drop("__pid", "__rank")
    )
    return out


def build_term_dictionary(tokens: DataFrame) -> DataFrame:
    """Distinct terms -> ``(term, term_id)`` with term_id = lexicographic
    rank (dense, 0-based).  One distinct shuffle + the two-phase ranker.
    """
    terms = tokens.select("term").distinct()
    return dense_rank_ids(terms, order_cols=["term"], id_col="term_id").select(
        "term", "term_id"
    )
