"""Did-you-mean spell correction (operators/spellcheck.py) — the
round-4 fuzzy-retrieval extension (driver-hashed as the ``fuzzy`` mode
of ``ranked_indexed_family``).

Pinned here:

* the correction rule equals a full python replay (own DP Levenshtein)
  on a corpus whose w00..w13 vocabulary makes distance ties routine —
  (dist, df desc, term asc) ordering is genuinely exercised;
* Spark's F.levenshtein and DuckDB's levenshtein agree on every
  (typo, vocab) pair the gate can see (the all-integer ordering only
  transfers across engines if the metric itself does);
* a query keeping an unresolvable token drops whole (S6 skip
  semantics); corrections colliding with literals fold to qtf=2
  (run_ranked_fuzzy == run_ranked over manually corrected queries).
"""

from __future__ import annotations

from collections import Counter

import pytest

from test_deletes import N_DOCS, VOCAB, _build, _corpus

TYPOS = [
    (0, ["w0", "w03"]),        # 'w0': dist 1 to ALL w0X -> df/term ties
    (1, ["w1z"]),              # dist 1 to w10..w13
    (2, ["qqqqq", "w05"]),     # unresolvable -> whole query drops
    (3, ["w07x", "w07"]),      # correction collides with literal
    (4, ["ww00"]),             # insertion typo
]


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def _dfs():
    df = Counter()
    for _d, text in _corpus(range(N_DOCS)):
        for t in set(text.split()):
            df[t] += 1
    return df


def _py_correct(queries, max_dist=2):
    df = _dfs()
    out = {}
    for qid, terms in queries:
        fixed = []
        for t in terms:
            t = t.lower()
            if t in df:
                fixed.append(t)
                continue
            cand = sorted(
                (_lev(t, v), -df[v], v) for v in df
                if abs(len(t) - len(v)) <= max_dist
                and _lev(t, v) <= max_dist
            )
            if not cand:
                fixed = None
                break
            fixed.append(cand[0][2])
        if fixed is not None:
            out[qid] = fixed
    return out


@pytest.fixture(scope="module")
def sp_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spidx") / "idx")
    _build(spark, d, range(N_DOCS))
    return d


def _dict_df(spark, sp_index):
    from partitioned_ef_ans_spark.index import build as b_mod

    _ix, _s, ts, _c, _m = b_mod.load_index(spark, sp_index)
    return ts.select("term", "df")


def test_correction_python_replay(spark, sp_index):
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.operators.spellcheck import (
        correct_query_terms,
    )

    got = {
        r["query_id"]: list(r["terms"])
        for r in correct_query_terms(
            queries_to_df(spark, TYPOS), _dict_df(spark, sp_index)
        ).collect()
    }
    want = _py_correct(TYPOS)
    assert got == want
    assert 2 not in got            # unresolvable token dropped the query
    assert got[3][0] == got[3][1] == "w07"   # collision -> same term twice
    # the 'w0' row hit a genuine multi-candidate tie at distance 1
    df = _dfs()
    tied = [v for v in df if abs(len(v) - 2) <= 2 and _lev("w0", v) == 1]
    assert len(tied) > 1


def test_fuzzy_equals_manual_correction(spark, sp_index):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod
    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.operators.spellcheck import (
        run_ranked_fuzzy,
    )

    index_df, _s, ts, codec, man = b_mod.load_index(spark, sp_index)
    got = run_ranked_fuzzy(
        spark, index_df, queries_to_df(spark, TYPOS), codec,
        man["num_docs"], man["avg_doc_len"], term_stats_df=ts,
        mode="blockmax", k=5, dtype="float64",
    )
    manual = sorted(_py_correct(TYPOS).items())
    want = q_mod.run_ranked(
        spark, index_df, queries_to_df(spark, manual), codec,
        man["num_docs"], man["avg_doc_len"], mode="blockmax", k=5,
        dtype="float64", term_stats_df=ts,
    )
    key = lambda df: [  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in df.orderBy("query_id", "rank").collect()
    ]
    rows = key(got)
    assert rows == key(want) and rows


def test_random_typos_fuzz(spark, sp_index):
    """100 seeded random typo strings through the full correction rule:
    Spark == python replay, and Spark's levenshtein == DuckDB's on
    every (typo, vocab) pair — one batched job per engine."""
    import random

    import duckdb

    rng = random.Random(0xC0FFEE)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789w"
    typos = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        for _ in range(100)
    ]
    queries = [(i, [t]) for i, t in enumerate(typos)]

    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.operators.spellcheck import (
        correct_query_terms,
    )

    got = {
        r["query_id"]: list(r["terms"])
        for r in correct_query_terms(
            queries_to_df(spark, queries), _dict_df(spark, sp_index)
        ).collect()
    }
    assert got == _py_correct(queries)

    from pyspark.sql import functions as F

    pairs = [(t, v) for t in set(typos) for v in VOCAB]
    sdf = spark.createDataFrame(pairs, "a string, b string")
    sgot = {
        (r["a"], r["b"]): r["d"]
        for r in sdf.select(
            "a", "b", F.levenshtein("a", "b").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in pairs)
        + ") AS t(a, b)"
    )
    dgot = {
        (a, b): d
        for a, b, d in con.sql(
            "SELECT a, b, levenshtein(a, b) FROM p"
        ).fetchall()
    }
    assert sgot == dgot


def test_spark_duckdb_levenshtein_agree(spark):
    import duckdb

    from partitioned_ef_ans_spark import gate

    pairs = [
        (t, v)
        for _q, terms in list(TYPOS) + list(gate.FUZZY_QUERIES)
        for t in terms
        for v in VOCAB + ["spark", "table", "window", "join", "dup",
                          "slow", "row", "scan"]
    ]
    sdf = spark.createDataFrame(pairs, "a string, b string")
    from pyspark.sql import functions as F

    got = [
        (r["a"], r["b"], r["d"])
        for r in sdf.select("a", "b", F.levenshtein("a", "b").alias("d"))
        .collect()
    ]
    con = duckdb.connect()
    for a, b, d in got:
        assert con.sql(
            f"SELECT levenshtein('{a}', '{b}')"
        ).fetchone()[0] == d, (a, b, d)


def test_gram_path_equals_scan_path(spark, sp_index, monkeypatch):
    """Forcing the large-dictionary 3-gram prefilter (scan crossover =
    0) must reproduce the scan path exactly — the q-gram count bound
    admits every true correction, Levenshtein removes the rest.  The
    typo set spans short terms (below the positive-bound length, which
    keep the scan) and long ones (gram join)."""
    from pyspark.sql import functions as F

    from partitioned_ef_ans_spark.operators.ranked import queries_to_df
    from partitioned_ef_ans_spark.operators import spellcheck as sc

    typos = TYPOS + [(5, ["wwww00x"]), (6, ["w1", "qqqqqqqq"])]
    qdf = queries_to_df(spark, typos)
    dic = _dict_df(spark, sp_index)
    want = sorted(
        (r["query_id"], tuple(r["terms"]))
        for r in sc.correct_query_terms(qdf, dic).collect()
    )
    monkeypatch.setenv("PEFA_FUZZY_SCAN_VOCAB", "0")
    dic2 = _dict_df(spark, sp_index)  # fresh frame: no memoized state
    corrected = sc.correct_query_terms(qdf, dic2)
    got = sorted(
        (r["query_id"], tuple(r["terms"])) for r in corrected.collect()
    )
    assert got == want
    # plan shape: the only cartesian left is the short-term fallback —
    # gram candidates come from the 3-gram equi-join, so the dictionary
    # is no longer crossJoined against every OOV term
    plan = corrected._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_gram_bound_admits_all_true_candidates():
    """Property check of the padded-q-gram count bound on random
    pairs: dist(s,t) <= d implies shared padded 3-grams (pair count)
    >= |t| + 2 - 3d."""
    import random

    rng = random.Random(7)
    alpha = "abcdef"

    def grams(t):
        s = "##" + t + "##"
        return [s[i:i + 3] for i in range(len(s) - 2)]

    for _ in range(300):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(4, 10)))
        s = list(t)
        d = rng.randint(0, 2)
        for _e in range(d):
            op = rng.choice("ids")
            i = rng.randrange(max(1, len(s)))
            if op == "i":
                s.insert(i, rng.choice(alpha))
            elif s:
                if op == "d":
                    del s[i % len(s)]
                else:
                    s[i % len(s)] = rng.choice(alpha)
        cand = "".join(s)
        gt, gc = grams(t), grams(cand)
        pairs = sum(min(gt.count(g), gc.count(g)) for g in set(gt))
        assert pairs >= len(t) + 2 - 3 * d, (t, cand, d, pairs)
