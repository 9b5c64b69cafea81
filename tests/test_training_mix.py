"""training_mix (operators/mix.py): each stage must act — quality
cut, canonical-only dedup, eval decontamination, deterministic
sampling — and the composition must equal the hand-applied stages on
any partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# long high-quality body: n_tokens >= 100 pushes the logistic past
# 0.6 regardless of stopword pressure (sigmoid(1.0 - 2*ratio) with
# ratio ~ 0 here)
_GOOD = "alpha beta gamma delta " + " ".join(f"w{i}" for i in range(100))
# a couple of tokens: sigmoid(~0.02) ~ 0.505 < 0.6 — fails quality
_SHORT = "tiny doc"
_EVAL_TEXT = "secret eval answer leaked verbatim into training data"

DOCS = [
    (1, _GOOD, "en"),
    (2, _GOOD, "en"),                      # exact dup of 1 — dropped
    (3, _GOOD + " unique tail", "en"),
    (4, _SHORT, "en"),                     # quality fail
    (5, _GOOD + " " + _EVAL_TEXT, "en"),   # contaminated
    (6, _GOOD + " zz", "de"),
    (7, _GOOD + " zz zz", "zh"),           # zh: rate 0 — sampled out
]
EVAL = [(100, _EVAL_TEXT)]
RATES = {"en": 1.0, "de": 1.0}


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    return docs, ev


def _mix_ids(docs, ev, **kw):
    from partitioned_ef_ans_spark.operators.mix import training_mix

    kw.setdefault("n", 3)
    kw.setdefault("quality_min", 0.6)
    kw.setdefault("max_overlap", 0.5)
    return {r["doc_id"] for r in training_mix(docs, ev, RATES, **kw).collect()}


def test_each_stage_acts(spark, frames):
    docs, ev = frames
    got = _mix_ids(docs, ev)
    # 2 dup-dropped, 4 quality-dropped, 5 contaminated, 7 rate-0 lang
    assert got == {1, 3, 6}


def test_partitioning_invariant(spark, frames):
    docs, ev = frames
    assert _mix_ids(docs.repartition(7), ev) == _mix_ids(
        docs.coalesce(1), ev
    )


def test_sampling_stage_is_the_rate_sampler(spark, frames):
    """With permissive upstream thresholds the mix reduces to
    stratified_sample over the deduped pool — same hash draw."""
    from partitioned_ef_ans_spark.operators.sampling import stratified_sample

    docs, ev = frames
    rates = {"en": 0.5, "de": 0.5, "zh": 0.5}
    from partitioned_ef_ans_spark.operators.mix import training_mix

    got = {
        r["doc_id"]
        for r in training_mix(
            docs, ev, rates, quality_min=0.0, max_overlap=2.0, n=3
        ).collect()
    }
    pool = docs.where(~F.col("doc_id").isin(2))  # non-canonical dup
    want = {r["doc_id"] for r in stratified_sample(pool, rates).collect()}
    assert got == want


def test_mix_report(spark, frames):
    from partitioned_ef_ans_spark.operators.mix import mix_report, training_mix

    docs, ev = frames
    rep = {
        r["lang"]: (r["n_docs"], r["n_tokens"])
        for r in mix_report(
            training_mix(docs, ev, RATES, quality_min=0.6,
                         max_overlap=0.5, n=3)
        ).collect()
    }
    assert set(rep) == {"en", "de"}
    assert rep["en"][0] == 2 and rep["de"][0] == 1
    assert rep["de"][1] == 105  # _GOOD is 104 tokens + ' zz'


def test_budgets_final_stage(spark, frames):
    """budgets= swaps the final stage for the token-budget sampler
    over the identical cleaned pool."""
    from partitioned_ef_ans_spark.operators.mix import training_mix
    from partitioned_ef_ans_spark.operators.sampling import (
        stratified_token_budget,
    )

    docs, ev = frames
    clean = training_mix(  # rate 1.0 = the clean pool itself
        docs, ev, {l: 1.0 for l in ("en", "de", "zh")},
        quality_min=0.6, max_overlap=0.5, n=3,
    )
    want = {
        r["doc_id"]
        for r in stratified_token_budget(clean, {"en": 150}).collect()
    }
    got = {
        r["doc_id"]
        for r in training_mix(
            docs, ev, {}, budgets={"en": 150},
            quality_min=0.6, max_overlap=0.5, n=3,
        ).collect()
    }
    assert got == want
    # budget 150 admits at most one ~104-token doc: a strict cut of
    # the 2-doc clean en pool, and nothing from unbudgeted strata
    assert len(got) == 1 and got < {1, 3}


def test_neardup_dedup_stage(spark, frames):
    """dedup='neardup' drops fuzzy duplicates the exact stage keeps:
    doc 3 (_GOOD + ' unique tail') near-duplicates doc 1 (_GOOD) at
    jaccard ~ |shared|/|union| >> threshold, so only the min-id
    canonical survives; everything else matches the exact mode."""
    from partitioned_ef_ans_spark.operators.mix import training_mix

    docs, ev = frames
    got = {
        r["doc_id"]
        for r in training_mix(
            docs, ev, RATES, quality_min=0.6, max_overlap=0.5, n=3,
            dedup="neardup",
        ).collect()
    }
    exact = _mix_ids(docs, ev)
    assert exact == {1, 3, 6}
    # 3 collapses into 1's cluster; 6 ('... zz') differs enough only
    # if below the LSH/jaccard threshold — assert from the pairs
    from partitioned_ef_ans_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 3) in pairs
    want = {i for i in exact
            if i == 1 or ((1, i) not in pairs and (i, 1) not in pairs)}
    assert got == want and 3 not in got and 1 in got


def test_bad_dedup_mode_raises(spark, frames):
    from partitioned_ef_ans_spark.operators.mix import training_mix

    docs, ev = frames
    with pytest.raises(ValueError):
        training_mix(docs, ev, RATES, dedup="fuzzy")
