"""Float32 rank-identity fuzz for the vectorized block-pruned kernels.

The blockmax / maxscore_blockmax drop tests accumulate exact f64 sums
of f32 weights while the final scoring re-sums in float32 — without
the `_inflate` margin on the accumulated part, re-summation drift can
evict a doc whose rounded score ties the k-th.  This fuzz pins rank
identity (rounded-score + doc-id tie-break) against the exhaustive
ranked_or kernel on a real built index in BOTH dtypes, 200 seeded
random queries each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

K = 10


@pytest.fixture(scope="module")
def built(spark):
    from partitioned_ef_ans_spark.gate import _get_index

    ix = _get_index(spark, "/root/testdata/sf0.001")
    pdf = ix["index_df"].toPandas()
    return ix, pdf


def _q_pdf(pdf, terms):
    from collections import Counter

    c = Counter(terms)
    rows = pdf[pdf["term"].isin(list(c))]
    if not len(rows):
        return None, c
    rows = rows.copy().assign(query_id=0, n_terms=len(c))
    rows["qtf"] = [c[t] for t in rows["term"]]
    rows["max_weight"] = rows.groupby("term")["chunk_max_weight"].transform("max")
    return rows, c


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_blockmax_kernels_rank_identical_to_ranked_or(built, dtype):
    from partitioned_ef_ans_spark.index import blockmax as bmx
    from partitioned_ef_ans_spark.index import query as q

    ix, pdf = built
    codec, nd, avg = ix["codec"], ix["num_docs"], ix["avg_len"]
    vocab = sorted(pdf["term"].unique())
    rng = np.random.default_rng(17)
    checked = 0
    for _ in range(200):
        n = int(rng.integers(1, 6))
        terms = list(rng.choice(vocab, n, replace=True))
        rows, c = _q_pdf(pdf, terms)
        if rows is None:
            continue
        lists, norms = q._decode_group(rows, codec, avg)
        tws = q._term_weights(lists, norms, dtype, tag=codec.tag)
        per_term = rows.drop_duplicates("term").set_index("term")
        weights = {
            t: q._q_weight(per_term.loc[t, "qtf"], per_term.loc[t, "df"], nd, dtype)
            for t in lists
        }
        oracle = q._kernel_ranked_or(lists, tws, weights, dtype, 0, K)
        got_bm = bmx.kernel_blockmax(rows, codec, nd, avg, K, dtype)
        got_ms = bmx.kernel_maxscore_blockmax(rows, codec, nd, avg, K, dtype)
        for name, got in (("blockmax", got_bm), ("maxscore_blockmax", got_ms)):
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True),
                oracle.reset_index(drop=True),
                check_dtype=False,
                obj=f"{name} vs ranked_or (terms={terms})",
            )
        checked += 1
    assert checked > 150
