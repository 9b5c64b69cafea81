"""A11 decode-kind counters: invariants against the index the gate
builds (every posting lands in exactly one kind per stream; kind
assignment matches the encoder's special paths)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def built(spark, sf_small):
    from partitioned_ef_ans_spark.gate import _get_index

    return _get_index(spark, sf_small)


def test_kind_postings_partition_totals(spark, built):
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.index.stats import ans_decode_kind_stats

    pdf = ans_decode_kind_stats(spark, built["index_df"], built["codec"])
    total = built["index_df"].agg(F.sum("n")).collect()[0][0]
    docs = pdf[pdf["kind"].str.startswith("docs_")]
    freqs = pdf[pdf["kind"].str.startswith("freqs_")]
    assert int(docs["postings"].sum()) == total
    assert int(freqs["postings"].sum()) == total
    # freqs stream never takes the docs-only special paths
    assert not any(freqs["kind"].isin(["freqs_zero_sum", "freqs_vbyte"]))
    # the skewed gate corpus must exercise both the ans path and at
    # least one special path on the docs side
    assert "docs_ans" in set(pdf["kind"]) or "docs_model0" in set(pdf["kind"])
    assert int(pdf["except_bytes"].sum()) >= 0
