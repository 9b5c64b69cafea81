"""Deterministic stratified sampling (operators/sampling.py): the
md5-keyed keep set replayed in pure Python, partitioning invariance,
exact per-stratum caps, and the two-stage top-k == naive window."""

from __future__ import annotations

import hashlib

import pytest

ROWS = [(i, ["en", "de", "es"][i % 3]) for i in range(300)]
SEED = "t0"


def _h(i):
    return int(hashlib.md5(f"{SEED}:{i}".encode()).hexdigest()[:15], 16)


def _df(spark, parts=4):
    return spark.createDataFrame(
        ROWS, "doc_id long, lang string"
    ).repartition(parts)


def test_rate_mode_matches_python_md5(spark):
    from partitioned_ef_ans_spark.operators.sampling import (
        HASH_SPACE,
        stratified_sample,
    )

    rates = {"en": 0.5, "de": 0.1}
    got = {
        r["doc_id"]
        for r in stratified_sample(_df(spark), rates, seed=SEED).collect()
    }
    want = {
        i for i, lang in ROWS
        if lang in rates and _h(i) < int(rates[lang] * HASH_SPACE)
    }
    assert got == want and want
    # es has no rate and default_rate=0 -> fully dropped
    assert all(lang != "es" for i, lang in ROWS if i in got)


def test_rate_mode_partitioning_invariant(spark):
    from partitioned_ef_ans_spark.operators.sampling import stratified_sample

    rates = {"en": 0.3, "de": 0.7, "es": 1.0}
    a = {r["doc_id"] for r in
         stratified_sample(_df(spark, 1), rates, seed=SEED).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(_df(spark, 17), rates, seed=SEED).collect()}
    assert a == b
    # rate 1.0 keeps the whole stratum
    assert {i for i, lang in ROWS if lang == "es"} <= a


def test_rate_out_of_range_raises(spark):
    from partitioned_ef_ans_spark.operators.sampling import stratified_sample

    with pytest.raises(ValueError):
        stratified_sample(_df(spark), {"en": 1.5})


def test_cap_mode_exact_counts_and_smallest_hashes(spark):
    from partitioned_ef_ans_spark.operators.sampling import stratified_cap

    caps = {"en": 7, "de": 1000}  # de's cap exceeds |de| -> whole stratum
    got = [(r["doc_id"], r["lang"])
           for r in stratified_cap(_df(spark), caps, seed=SEED).collect()]
    by_lang = {}
    for d, lang in got:
        by_lang.setdefault(lang, set()).add(d)
    n_de = sum(1 for _, lang in ROWS if lang == "de")
    assert len(by_lang["en"]) == 7
    assert len(by_lang["de"]) == min(1000, n_de) == n_de
    assert "es" not in by_lang  # uncapped stratum dropped
    # exactly the 7 smallest hashes of the en stratum
    en_sorted = sorted(
        (i for i, lang in ROWS if lang == "en"), key=lambda i: (_h(i), i)
    )
    assert by_lang["en"] == set(en_sorted[:7])


def test_cap_mode_two_stage_equals_naive_window(spark):
    """The salted two-stage top-k must be row-identical to the naive
    single-window form at any parallelism."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.operators.sampling import (
        sample_hash,
        stratified_cap,
    )

    caps = {"en": 13, "de": 5, "es": 1}
    got = {
        (r["doc_id"], r["lang"])
        for r in stratified_cap(_df(spark, 11), caps, seed=SEED).collect()
    }
    df = _df(spark, 3).withColumn("_h", sample_hash(F.col("doc_id"), SEED))
    w = Window.partitionBy("lang").orderBy("_h", "doc_id")
    cap_col = F.create_map(
        *[x for s, c in caps.items() for x in (F.lit(s), F.lit(c))]
    )[F.col("lang")]
    naive = {
        (r["doc_id"], r["lang"])
        for r in df.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= cap_col).select("doc_id", "lang").collect()
    }
    assert got == naive


def test_token_budget_matches_python_cumsum(spark):
    from partitioned_ef_ans_spark.operators.sampling import (
        stratified_token_budget,
    )

    rows = [(i, ["en", "de", "es"][i % 3], (i * 7) % 13 + 1)
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, ntok long"
    ).repartition(11)
    budgets = {"en": 120, "de": 40}
    got = {
        r["doc_id"]
        for r in stratified_token_budget(
            df, budgets, token_col="ntok", seed=SEED
        ).collect()
    }
    want = set()
    for lang, b in budgets.items():
        c = 0
        for i, _l, t in sorted(
            (r for r in rows if r[1] == lang),
            key=lambda r: (_h(r[0]), r[0]),
        ):
            c += t
            if c <= b:
                want.add(i)
    assert got == want and want
    # the budget is a prefix cut, not a subset filter: strictly fewer
    # docs than the stratum and nothing from the absent 'es' stratum
    assert len(got) < sum(1 for r in rows if r[1] == "en") + sum(
        1 for r in rows if r[1] == "de"
    )


def test_token_budget_partitioning_invariant_and_text_default(spark):
    from partitioned_ef_ans_spark.operators.sampling import (
        stratified_token_budget,
    )

    rows = [(i, "en", "tok " * (i % 7 + 1)) for i in range(120)]
    budgets = {"en": 90}
    a = {
        r["doc_id"]
        for r in stratified_token_budget(
            spark.createDataFrame(
                rows, "doc_id long, lang string, text string"
            ).coalesce(1),
            budgets, seed=SEED,
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_token_budget(
            spark.createDataFrame(
                rows, "doc_id long, lang string, text string"
            ).repartition(13),
            budgets, seed=SEED,
        ).collect()
    }
    assert a == b and a
    # python oracle on whitespace token counts
    c, want = 0, set()
    for i, _l, t in sorted(rows, key=lambda r: (_h(r[0]), r[0])):
        c += t.count("tok")
        if c <= 90:
            want.add(i)
    assert a == want


def test_token_budget_smaller_than_first_doc_is_empty(spark):
    from partitioned_ef_ans_spark.operators.sampling import (
        stratified_token_budget,
    )

    rows = [(i, "en", 50) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ntok long")
    out = stratified_token_budget(
        df, {"en": 49}, token_col="ntok", seed=SEED
    ).collect()
    assert out == []
