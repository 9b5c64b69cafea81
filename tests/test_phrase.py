"""Phrase retrieval via bigram shingles (index/phrase.py +
tokenizer.shingles_array): exactness incl. the verification join that
kills conjunction false positives, masking composition, and the
ranked path against the relational shingle-BM25 oracle."""

from __future__ import annotations

import re

import pytest

DOCS = [
    (0, "alpha beta gamma delta"),          # "alpha beta gamma" exact
    (1, "alpha beta xx beta gamma"),        # both bigrams, NOT the trigram
    (2, "beta gamma alpha beta"),           # both bigrams, wrong order
    (3, "alpha beta gamma"),                # exact again
    (4, "gamma beta alpha"),                # neither bigram
    (5, "x"),                               # single token: no shingle
    (6, ""),                                # empty
    (7, "alpha beta, gamma! alpha-beta"),   # punctuation splits count
]

PHRASES = [
    (0, "alpha beta"),
    (1, "beta gamma"),
    (2, "alpha beta gamma"),
    (3, "gamma delta"),
    (4, "zz qq"),
]


def _tokens(text):
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def _exact(phrase, text):
    toks = _tokens(text)
    p = phrase.split()
    return any(toks[i:i + len(p)] == p for i in range(len(toks)))


def _want_matches():
    return {
        (qid, d)
        for qid, p in PHRASES
        for d, text in DOCS
        if _exact(p, text)
    }


@pytest.fixture(scope="module")
def phrase_ix(spark, tmp_path_factory):
    from partitioned_ef_ans_spark.index import phrase as ph_mod

    d = str(tmp_path_factory.mktemp("phraseidx") / "idx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ph_mod.build_phrase_index(spark, docs, d, codec="ans", n=2,
                              chunk_postings=8)
    return d, docs


def test_shingles_array_matches_python(spark):
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.tokenizer import shingles_array

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["sh"])
        for r in df.select("doc_id",
                           shingles_array(F.col("text")).alias("sh")).collect()
    }
    for d, text in DOCS:
        toks = _tokens(text)
        want = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert got[d] == want, (d, text)


def test_phrase_matches_exact_with_verification(spark, phrase_ix):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import phrase as ph_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    d, docs = phrase_ix
    index_df, _s, ts, codec, _m = b_mod.load_index(spark, d)
    qdf = queries_to_df(spark, [(q, p.split()) for q, p in PHRASES])

    got = {
        (r["query_id"], r["doc_id"])
        for r in ph_mod.phrase_matches(
            spark, index_df, qdf, codec, docs_df=docs, text_col="text",
            term_stats_df=ts,
        ).collect()
    }
    assert got == _want_matches()
    # the verification is load-bearing: docs 1 and 2 hold both bigrams
    # of the trigram phrase but not the phrase
    cand = {
        (r["query_id"], r["doc_id"])
        for r in ph_mod.phrase_matches(
            spark, index_df, qdf, codec, docs_df=None, term_stats_df=ts,
        ).collect()
    }
    assert (2, 1) in cand and (2, 2) in cand
    assert (2, 1) not in got and (2, 2) not in got


def test_phrase_matches_masking(spark, phrase_ix):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import phrase as ph_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    d, docs = phrase_ix
    index_df, _s, ts, codec, _m = b_mod.load_index(spark, d)
    qdf = queries_to_df(spark, [(q, p.split()) for q, p in PHRASES])
    got = {
        (r["query_id"], r["doc_id"])
        for r in ph_mod.phrase_matches(
            spark, index_df, qdf, codec, docs_df=docs, text_col="text",
            term_stats_df=ts, tombstones=[0], allowlist=[0, 1, 2, 3],
        ).collect()
    }
    assert got == {(q, dd) for q, dd in _want_matches() if dd in (1, 2, 3)}


def test_phrase_ranked_matches_relational_oracle(spark, phrase_ix):
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark import tokenizer
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import phrase as ph_mod
    from partitioned_ef_ans_spark.operators import doc_stats as ds_mod
    from partitioned_ef_ans_spark.operators import postings as p_mod
    from partitioned_ef_ans_spark.operators import ranked as r_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    d, docs = phrase_ix
    bigram_qs = [(q, p) for q, p in PHRASES if len(p.split()) == 2]
    qdf = queries_to_df(spark, [(q, p.split()) for q, p in bigram_qs])

    index_df, _s, ts, codec, man = b_mod.load_index(spark, d)
    got = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in ph_mod.run_phrase_ranked(
            spark, index_df, qdf, codec, man["num_docs"],
            man["avg_doc_len"], k=10, term_stats_df=ts,
        ).orderBy("query_id", "rank").collect()
    ]

    # relational oracle: exhaustive BM25 over the shingle tf
    toks2 = tokenizer.tokenize_shingles(docs, doc_col="doc_id",
                                        text_col="text", n=2)
    tf2 = tokenizer.term_frequencies(toks2)
    stats2 = ds_mod.build_doc_stats(docs.select("doc_id"), tf2)
    dfs2 = p_mod.term_doc_freqs(tf2)
    shq = queries_to_df(
        spark, [(q, [p]) for q, p in bigram_qs]
    )
    want = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in r_mod.ranked_query(
            tf2, stats2, dfs2, shq, docs.count(), k=10, conjunctive=True
        ).orderBy("query_id", "rank").collect()
    ]
    assert got == want and got


def test_shingle_queries_drop_short_phrases(spark):
    from partitioned_ef_ans_spark.index.phrase import shingle_queries
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    qdf = queries_to_df(spark, [(0, ["one"]), (1, ["a", "b", "c"])])
    rows = {r["query_id"]: list(r["terms"])
            for r in shingle_queries(qdf).collect()}
    assert rows == {1: ["a b", "b c"]}


def test_phrase_index_maintenance_keeps_token_rule(spark, tmp_path):
    """A shingle index is maintainable like any index: the manifest
    records the token rule (ngram), the LSM delta update shingles new
    docs with it, and compaction preserves it — phrase matches stay
    exact across the whole lifecycle."""
    import json

    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import phrase as ph_mod
    from partitioned_ef_ans_spark.index.checkpoint import (
        build_index_resumable,
        compact_index,
        update_index_delta,
    )
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df

    d = str(tmp_path / "idx")
    docs0 = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index_resumable(spark, docs0, d, codec="ans", num_parts=2,
                          chunk_postings=8, ngram=2)
    assert json.load(open(f"{d}/manifest.json"))["ngram"] == 2

    new = [(100, "alpha beta gamma zz"), (101, "beta alpha")]
    update_index_delta(
        spark, d, spark.createDataFrame(new, "doc_id long, text string")
    )
    all_docs = spark.createDataFrame(DOCS + new, "doc_id long, text string")

    def matches():
        index_df, _s, ts, codec, _m = b_mod.load_index(spark, d)
        qdf = queries_to_df(spark, [(q, p.split()) for q, p in PHRASES])
        return {
            (r["query_id"], r["doc_id"])
            for r in ph_mod.phrase_matches(
                spark, index_df, qdf, codec, docs_df=all_docs,
                text_col="text", term_stats_df=ts,
            ).collect()
        }

    want = {
        (qid, dd)
        for qid, p in PHRASES
        for dd, text in DOCS + new
        if _exact(p, text)
    }
    assert (2, 100) in want  # the delta doc holds the trigram
    assert matches() == want

    compact_index(spark, d)
    assert json.load(open(f"{d}/manifest.json"))["ngram"] == 2
    assert matches() == want
