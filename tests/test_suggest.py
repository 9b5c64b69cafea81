"""Prefix autocomplete (operators/suggest.py): python replay of the
(startswith, df desc, term asc) rule from the raw corpus, case fold,
and the n cut."""

from __future__ import annotations

from collections import Counter

from test_deletes import N_DOCS, _build, _corpus


def _py_suggest(prefixes, n):
    df = Counter()
    for _d, text in _corpus(range(N_DOCS)):
        for t in set(text.split()):
            df[t] += 1
    out = []
    for p in sorted(set(x.lower() for x in prefixes)):
        hits = sorted(
            (-df[t], t) for t in df if t.startswith(p)
        )[:n]
        out += [(p, i + 1, t, -negdf) for i, (negdf, t) in enumerate(hits)]
    return out


def test_suggest_python_replay(spark, tmp_path):
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.operators.suggest import suggest_terms

    d = str(tmp_path / "sgidx")
    _build(spark, d, range(N_DOCS))
    _ix, _s, ts, _c, _m = b_mod.load_index(spark, d)
    prefixes = ["w0", "W1", "w13", "zz", "w"]
    pre = spark.createDataFrame([(p,) for p in prefixes], "prefix string")
    got = [
        (r["prefix"], r["rank"], r["term"], r["df"])
        for r in suggest_terms(pre, ts, n=3)
        .orderBy("prefix", "rank").collect()
    ]
    want = _py_suggest(prefixes, 3)
    assert got == want
    assert not [g for g in got if g[0] == "zz"]       # no-match prefix
    assert len([g for g in got if g[0] == "w"]) == 3  # n cut applied
