"""Index-backed decontamination: contamination_via_index over a
width-n shingle index must equal the corpus-scan contamination
operator row-for-row, compose with tombstones, and never gather."""

from __future__ import annotations

import pytest

from tests.test_decontam import DOCS, EVAL, N


@pytest.fixture(scope="module")
def shingle3_ix(spark, tmp_path_factory):
    from partitioned_ef_ans_spark.index import phrase as ph_mod

    d = str(tmp_path_factory.mktemp("dcidx") / "idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ph_mod.build_phrase_index(spark, docs, d, codec="ans", n=N,
                              chunk_postings=8)
    return d, docs


def _corpus_scan(spark, docs, ev, min_overlap=0.0):
    from partitioned_ef_ans_spark.operators.decontam import contamination

    return {
        (r["doc_id"], r["eval_id"]):
            (r["n_hit"], r["eval_ngrams"], r["overlap_frac"])
        for r in contamination(docs, ev, n=N,
                               min_overlap=min_overlap).collect()
    }


def test_via_index_equals_corpus_scan(spark, shingle3_ix):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.decontam import (
        contamination_via_index,
    )

    d, docs = shingle3_ix
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    index_df, _s, ts, codec, man = b_mod.load_index(spark, d)
    assert man["ngram"] == N
    got = {
        (r["doc_id"], r["eval_id"]):
            (r["n_hit"], r["eval_ngrams"], r["overlap_frac"])
        for r in contamination_via_index(
            spark, index_df, ev, codec, n=N, term_stats_df=ts,
        ).collect()
    }
    assert got == _corpus_scan(spark, docs, ev)
    assert got  # non-vacuous


def test_via_index_threshold_and_tombstones(spark, shingle3_ix):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.decontam import (
        contamination_via_index,
    )

    d, docs = shingle3_ix
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    index_df, _s, ts, codec, _m = b_mod.load_index(spark, d)
    base = _corpus_scan(spark, docs, ev, min_overlap=0.5)
    got = {
        (r["doc_id"], r["eval_id"])
        for r in contamination_via_index(
            spark, index_df, ev, codec, n=N, min_overlap=0.5,
            term_stats_df=ts, tombstones=[1],
        ).collect()
    }
    # tombstoned doc 1 (the exact copy) must not be reported
    assert got == {k for k in base if k[0] != 1}
    assert any(k[0] == 1 for k in base)


def test_wrong_width_refused(spark, shingle3_ix):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.decontam import (
        contamination_via_index,
    )

    d, _docs = shingle3_ix
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    index_df, _s, ts, codec, man = b_mod.load_index(spark, d)
    with pytest.raises(ValueError):
        contamination_via_index(
            spark, index_df, ev, codec, n=N + 1, term_stats_df=ts,
            index_ngram=man["ngram"],
        )
