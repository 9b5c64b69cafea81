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


def test_via_index_after_delta_update(spark, shingle3_ix, tmp_path):
    """Maintenance composition: an eval-set check against a shingle
    index that has taken an LSM delta segment must equal the corpus
    scan over the UPDATED corpus (the manifest token rule re-shingles
    the new docs; per-segment decode routing handles the rest)."""
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        update_index_delta,
    )
    from partitioned_ef_ans_spark.operators.decontam import (
        contamination_via_index,
    )

    _d0, docs = shingle3_ix
    d = str(tmp_path / "idx_delta")
    # delta updates need the resumable layout (num_parts in manifest)
    build_index_resumable(spark, docs, d, codec="ans", num_parts=2,
                          chunk_postings=8, ngram=N)
    # a fresh doc that strongly overlaps eval item and one clean doc
    new = spark.createDataFrame(
        [(100, EVAL[0][1] + " trailing tail"),
         (101, "completely unrelated fresh content words here")],
        "doc_id long, text string",
    )
    update_index_delta(spark, d, new)
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    index_df, _s, ts, codec, man = b_mod.load_index(spark, d)
    got = {
        (r["doc_id"], r["eval_id"]):
            (r["n_hit"], r["eval_ngrams"], r["overlap_frac"])
        for r in contamination_via_index(
            spark, index_df, ev, codec, n=N, term_stats_df=ts,
            index_ngram=man["ngram"],
        ).collect()
    }
    want = _corpus_scan(spark, docs.unionByName(new), ev)
    assert got == want
    assert any(doc == 100 for doc, _e in got)  # delta doc is visible
