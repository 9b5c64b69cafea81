"""Exact pins for the three rows-only ANS stats gate entries
(index_stats / index_block_stats / index_decode_kinds).

The driver gate can only count their rows (codec byte accounting has
no SQL oracle), so regressions there would be silent.  These tests
recount the same quantities through INDEPENDENT paths — re-encoding
the decoded lists with the frozen models, reclassifying blocks from
the raw postings via blockize — and assert exact equality, so a
change in byte accounting or kind assignment fails loudly here.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def built(spark, sf_small):
    from partitioned_ef_ans_spark.gate import _get_index

    return _get_index(spark, sf_small)


@pytest.fixture(scope="module")
def decoded_lists(built):
    """(payload rows, decoded (docs, freqs) per list) for the whole
    index, in one collected pass (sf0.001: tiny)."""
    rows = (
        built["index_df"]
        .select("term", "chunk_id", "n", "payload")
        .collect()
    )
    payloads = [bytes(r["payload"]) for r in rows]
    return rows, built["codec"].decode_lists(payloads), payloads


def test_index_stats_pinned_by_reencode(built, decoded_lists):
    """manifest payload_bytes/total_postings recounted by re-encoding
    every decoded list against the same frozen models: the encoder is
    deterministic, so the byte total must match EXACTLY."""
    rows, decoded, payloads = decoded_lists
    reenc = built["codec"].encode_lists(
        [d for d, _ in decoded], [f for _, f in decoded]
    )
    assert sum(len(p) for p in reenc) == built["manifest"]["payload_bytes"]
    # and byte-identical per list, not just in total
    for p_old, p_new in zip(payloads, reenc):
        assert p_old == p_new
    assert sum(len(d) for d, _ in decoded) == built["manifest"]["total_postings"]
    bpp = built["manifest"]["payload_bytes"] * 8 / built["manifest"]["total_postings"]
    assert abs(bpp - built["manifest"]["bits_per_posting"]) < 1e-9


def test_block_class_stats_pinned(spark, built, decoded_lists):
    """Per-class postings recounted independently from each chunk's n
    (small: n < bs whole list; full: complete blocks; last: trailing
    partial), and the class bytes must conserve the manifest total."""
    from partitioned_ef_ans_spark.index.stats import block_class_stats

    rows, _, payloads = decoded_lists
    bs = built["codec"].block_size
    exp = {"small": 0, "full": 0, "last": 0}
    for r in rows:
        n = int(r["n"])
        if n < bs:
            exp["small"] += n
        else:
            exp["full"] += (n // bs) * bs
            exp["last"] += n % bs
    pdf = block_class_stats(spark, built["index_df"], built["codec"]).set_index("cls")
    for cls, want in exp.items():
        got = int(pdf.loc[cls, "postings"]) if cls in pdf.index else 0
        assert got == want, (cls, got, want)
    assert int(pdf.loc["total", "postings"]) == sum(exp.values())
    # byte conservation: the stream bytes the class table attributes
    # can never exceed the real payload, and the remainder is exactly
    # the per-list headers (vbyte(n) + maxs + endpoints prefixes)
    cls_rows = pdf.drop(index="total")
    accounted = int(cls_rows["doc_bytes"].sum() + cls_rows["freq_bytes"].sum())
    total_payload = sum(len(p) for p in payloads)
    assert 0 < accounted <= total_payload
    assert total_payload == built["manifest"]["payload_bytes"]


def test_decode_kind_counters_pinned(spark, built, decoded_lists):
    """Kind assignment recounted from the RAW postings (blockize of the
    oracle-verified decoded lists): zero_sum and vbyte blocks are fully
    determined by (sums, ns); the remaining docs/freqs blocks must be
    exactly the parser's model0+ans counts, and postings totals per
    kind must match block-by-block."""
    from partitioned_ef_ans_spark.codecs import ans_msb, blocks
    from partitioned_ef_ans_spark.index.stats import ans_decode_kind_stats

    rows, decoded, _ = decoded_lists
    DB, FB, NS, SUMS, _, _ = blocks.blockize_many(
        [d for d, _ in decoded], [f for _, f in decoded], ans_msb.BLOCK_SIZE
    )
    exp = {}

    def add(kind, nblk, npost):
        b, p = exp.get(kind, (0, 0))
        exp[kind] = (b + nblk, p + npost)

    zero = SUMS == 0
    vby = (~zero) & (NS <= ans_msb.VBYTE_THRESHOLD)
    rest = ~(zero | vby)
    add("docs_zero_sum", int(zero.sum()), int(NS[zero].sum()))
    add("docs_vbyte", int(vby.sum()), int(NS[vby].sum()))
    add("docs_rest", int(rest.sum()), int(NS[rest].sum()))
    # freqs stream: sum unknown -> never zero_sum/vbyte
    add("freqs_rest", len(NS), int(NS.sum()))

    pdf = ans_decode_kind_stats(spark, built["index_df"], built["codec"])
    got = {r["kind"]: (int(r["blocks"]), int(r["postings"])) for _, r in pdf.iterrows()}
    assert got.get("docs_zero_sum", (0, 0)) == exp["docs_zero_sum"]
    assert got.get("docs_vbyte", (0, 0)) == exp["docs_vbyte"]
    d_rest = tuple(
        sum(x) for x in zip(
            got.get("docs_model0", (0, 0)), got.get("docs_ans", (0, 0))
        )
    )
    assert d_rest == exp["docs_rest"]
    f_rest = tuple(
        sum(x) for x in zip(
            got.get("freqs_model0", (0, 0)), got.get("freqs_ans", (0, 0))
        )
    )
    assert f_rest == exp["freqs_rest"]
    assert int(pdf["except_bytes"].sum()) >= 0


def test_model_pass_driver_fanin_bounded(built):
    """Two-level count aggregation: the driver collects a constant
    number of merged partials (2 streams x _MERGE_FANIN max), recorded
    in the manifest."""
    from partitioned_ef_ans_spark.index.build import _MERGE_FANIN

    got = built["manifest"]["model_partials_collected"]
    assert 0 < got <= 2 * _MERGE_FANIN


def test_ans_kind_stats_rejects_non_msb_codec(spark, built):
    from partitioned_ef_ans_spark.index.build import IndexCodec
    from partitioned_ef_ans_spark.index.stats import ans_decode_kind_stats

    u32 = IndexCodec("u32", None, num_docs=built["num_docs"])
    with pytest.raises(ValueError):
        ans_decode_kind_stats(spark, built["index_df"], u32)
