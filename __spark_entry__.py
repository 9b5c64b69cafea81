"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship ranked-OR BM25 query end-to-end on
sf0.001; ``queries``/``oracle_sql`` expose each implemented operator
from SURVEY.md §2 with a DuckDB-equivalent oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from partitioned_ef_ans_spark import gate, gate_training  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exhaustive BM25 ranked-OR top-10 for the fixed
    gate query set over /root/testdata/sf0.001 documents."""
    return gate.q_ranked_or(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize_tf": gate.q_tokenize_tf,
        "term_dictionary": gate.q_term_dictionary,
        "term_stats": gate.q_term_stats,
        "doc_stats": gate.q_doc_stats,
        "postings_flat": gate.q_postings_flat,
        "bool_and": gate.q_bool_and,
        "bool_or": gate.q_bool_or,
        "ranked_or_top10": gate.q_ranked_or,
        "ranked_and_top10": gate.q_ranked_and,
        "index_decode_flat": gate.q_index_decode_flat,
        "wand_top10": gate.q_wand_top10,
        "wand_blockmax_top10": gate.q_wand_blockmax_top10,
        "blockmax_docpart_top10": gate.q_blockmax_docpart_top10,
        "maxscore_top10": gate.q_maxscore_top10,
        "taat_top10": gate.q_taat_top10,
        "ranked_or_docpart": gate.q_ranked_or_docpart,
        "ranked_or_indexed": gate.q_ranked_or_indexed,
        "ranked_and_indexed": gate.q_ranked_and_indexed,
        "bool_and_indexed": gate.q_bool_and_indexed,
        "bool_or_indexed": gate.q_bool_or_indexed,
        "index_stats": gate.q_index_stats,
        "index_block_stats": gate.q_index_block_stats,
        "index_stats_u32": gate.q_index_stats_u32,
        "index_block_stats_u32": gate.q_index_block_stats_u32,
        "index_decode_kinds": gate.q_index_decode_kinds,
        "index_decode_flat_pef": gate.q_index_decode_flat_pef,
        "wand_top10_pef": gate.q_wand_top10_pef,
        "index_decode_flat_ef": gate.q_index_decode_flat_ef,
        "index_decode_flat_single": gate.q_index_decode_flat_single,
        "index_decode_flat_uniform": gate.q_index_decode_flat_uniform,
        "index_decode_flat_simple16": gate.q_index_decode_flat_simple16,
        "index_decode_flat_interp": gate.q_index_decode_flat_interp,
        "index_decode_flat_ans_max1d": gate.q_index_decode_flat_ans_max1d,
        "index_decode_flat_ans_minmax2d": gate.q_index_decode_flat_ans_minmax2d,
        "index_decode_flat_ans_med90p2d": gate.q_index_decode_flat_ans_med90p2d,
        "index_decode_flat_ans_med90p2dm": gate.q_index_decode_flat_ans_med90p2dm,
        "index_decode_flat_anspacked": gate.q_index_decode_flat_anspacked,
        "wand_top10_ef": gate.q_wand_top10_ef,
        **gate_training.TRAINING_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tokenize_tf": gate.sql_tokenize_tf(),
        "term_dictionary": gate.sql_term_dictionary(),
        "term_stats": gate.sql_term_stats(),
        "doc_stats": gate.sql_doc_stats(),
        "postings_flat": gate.sql_postings_flat(),
        "bool_and": gate.sql_bool_and(),
        "bool_or": gate.sql_bool_or(),
        "ranked_or_top10": gate.sql_ranked_or(),
        "ranked_and_top10": gate.sql_ranked_and(),
        # compressed-path operators share the relational oracles: the
        # index must reproduce them exactly (decode-equality + rank-
        # identical top-k). index_stats is rows-only (codec byte counts
        # have no SQL equivalent).
        "index_decode_flat": gate.sql_postings_flat(),
        "wand_top10": gate.sql_ranked_or(),
        "wand_blockmax_top10": gate.sql_ranked_or(),
        "blockmax_docpart_top10": gate.sql_ranked_or(),
        "maxscore_top10": gate.sql_ranked_or(),
        "taat_top10": gate.sql_ranked_or(),
        "ranked_or_docpart": gate.sql_ranked_or(),
        "ranked_or_indexed": gate.sql_ranked_or(),
        "ranked_and_indexed": gate.sql_ranked_and(),
        "bool_and_indexed": gate.sql_bool_and(),
        "bool_or_indexed": gate.sql_bool_or(),
        "index_decode_flat_pef": gate.sql_postings_flat(),
        "wand_top10_pef": gate.sql_ranked_or(),
        "index_stats_u32": gate.sql_index_stats_u32(),
        "index_block_stats_u32": gate.sql_index_block_stats_u32(),
        "index_decode_flat_ef": gate.sql_postings_flat(),
        "index_decode_flat_single": gate.sql_postings_flat(),
        "index_decode_flat_uniform": gate.sql_postings_flat(),
        "index_decode_flat_simple16": gate.sql_postings_flat(),
        "index_decode_flat_interp": gate.sql_postings_flat(),
        "index_decode_flat_ans_max1d": gate.sql_postings_flat(),
        "index_decode_flat_ans_minmax2d": gate.sql_postings_flat(),
        "index_decode_flat_ans_med90p2d": gate.sql_postings_flat(),
        "index_decode_flat_ans_med90p2dm": gate.sql_postings_flat(),
        "index_decode_flat_anspacked": gate.sql_postings_flat(),
        "wand_top10_ef": gate.sql_ranked_or(),
        **gate_training.TRAINING_ORACLES,
    }
