"""Single-threaded per-query latency sampling over a frozen index —
the reference's op_perftest shape (queries.cpp:23-52: per-query
timings, first run untimed, mean/q50/q90/q95 printed per operator).

Runs the ranked kernels directly in-process (no Spark job per query),
like the reference's sequential loop; used by ``bench.py --latency``
and the ``queries --latency`` CLI.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from collections import Counter

ALL_MODES = (
    "wand", "wand_bmw", "blockmax", "maxscore", "maxscore_blockmax", "taat",
    "ranked_or", "ranked_and",
)


def kernel_latency_stats(idx_dir: str, qs, modes=ALL_MODES, runs: int = 2,
                         k: int = 10, tombstones="auto") -> dict:
    """{mode: {mean, q50, q90, q95}} in microseconds over the query
    set ``qs`` = [(qid, [terms...]), ...] against the index at
    ``idx_dir``.

    ``tombstones``: "auto" (default) masks the index's tombstone
    sidecar exactly like the distributed paths; an explicit id
    collection masks that set; None times the unmasked kernels."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from partitioned_ef_ans_spark.index import blockmax as bmx_mod
    from partitioned_ef_ans_spark.index import build as b_mod
    from partitioned_ef_ans_spark.index import query as q_mod

    man = json.load(open(f"{idx_dir}/manifest.json"))
    side = pickle.load(open(f"{idx_dir}/models.pkl", "rb"))
    # mirror build.load_index: decode universe = the universe payloads
    # were ENCODED under (max_id+1 on sparse/updated indexes), never
    # the doc count — EF layouts are corrupt otherwise
    codec = b_mod.IndexCodec(
        side["codec"], side["models"],
        num_docs=man.get("universe", man["num_docs"]),
        delta_models=side.get("delta_models"),
        delta_universes=side.get("delta_universes"),
    )
    tbl = pq.read_table(f"{idx_dir}/index.parquet").to_pandas()
    nd = man["num_docs"]
    avg_len = man["avg_doc_len"]
    if "part" in tbl.columns:
        # mirror build.apply_bound_scales: stale parts' frozen bounds
        # must be admissibly inflated after avg_doc_len growth, or the
        # pruning kernels (wand/blockmax/maxscore) can drop true top-k
        from partitioned_ef_ans_spark.index.checkpoint import part_bound_scales

        scales = part_bound_scales(idx_dir, float(avg_len))
        if scales:
            s = tbl["part"].astype(int).map(scales).fillna(1.0).to_numpy()
            tbl["chunk_max_weight"] = (
                tbl["chunk_max_weight"].to_numpy(dtype=np.float64) * s
            ).astype(np.float32)
            if "block_max_weights" in tbl.columns:
                tbl["block_max_weights"] = [
                    None if bw is None
                    else (np.asarray(bw, dtype=np.float64) * sc).astype(np.float32)
                    for bw, sc in zip(tbl["block_max_weights"], s)
                ]
    if isinstance(tombstones, str) and tombstones == "auto":
        from partitioned_ef_ans_spark.index.checkpoint import load_tombstones

        tombstones = load_tombstones(idx_dir)
    tomb, ttag = q_mod.normalize_tombstones(tombstones)
    by_term = {t: g for t, g in tbl.groupby("term")}
    has_blocks = "block_maxs" in tbl.columns
    stats = {}
    for mode in modes:
        if mode not in ALL_MODES:
            # 'auto' resolves only in the run_ranked serving paths; an
            # unknown name must not silently time the trailing
            # ranked_and branch under a wrong label
            raise ValueError(
                f"kernel latency has no mode {mode!r}; choose from "
                f"{ALL_MODES}"
            )
        lat = []
        # pruning instrumentation: blockmax modes bump the module
        # counters; the faithful walks bump the chunk-lazy ones;
        # full-decode modes score every referenced block
        c0 = dict(bmx_mod.DECODE_COUNTERS)
        l0 = dict(q_mod.LAZY_COUNTERS)
        full_blocks = 0
        for run in range(runs):  # first run untimed (warms caches)
            for qid, terms in qs:
                c = Counter(terms)
                rows = [by_term[t] for t in c if t in by_term]
                if not rows:
                    continue
                pdf = pd.concat(rows).assign(
                    query_id=qid, n_terms=len(c),
                )
                pdf["qtf"] = [c[t] for t in pdf["term"]]
                # authoritative per-term df (chunk-row df is stale on
                # delta-segmented indexes) — mirrors query_lists_df
                pdf["df"] = pdf.groupby("term")["n"].transform("sum")
                # per-TERM bound = max over the term's chunks (a single
                # chunk's max would under-bound multi-chunk lists)
                pdf["max_weight"] = pdf.groupby("term")[
                    "chunk_max_weight"
                ].transform("max")
                if mode in ("blockmax", "maxscore_blockmax"):
                    fn = (
                        bmx_mod.kernel_blockmax
                        if mode == "blockmax"
                        else bmx_mod.kernel_maxscore_blockmax
                    )
                    t0 = time.perf_counter()
                    fn(pdf, codec, nd, avg_len, k, np.float32,
                       tomb=tomb, ttag=ttag)
                    if run:
                        lat.append((time.perf_counter() - t0) * 1e6)
                    continue
                if run == 0 and has_blocks:
                    full_blocks += int(
                        pdf["block_maxs"].map(len).sum()
                    )
                t0 = time.perf_counter()
                if mode in ("wand", "wand_bmw", "maxscore"):
                    # chunk-thresholded lazy decode (query._LazyEnum):
                    # multi-chunk lists skip whole chunks without
                    # decode/concat/tolist; short lists stay on the
                    # batched eager decode — the same split
                    # make_ranked_kernel serves
                    lists, tws = q_mod._faithful_lists(
                        pdf, codec, avg_len, tomb, np.float32, ttag,
                        lazy_ok=os.environ.get(
                            "PEFA_LAZY_FAITHFUL", "1") == "1",
                    )
                else:
                    lists, norms = q_mod._decode_group(pdf, codec, avg_len)
                    lists, norms = q_mod._apply_tomb(lists, norms, tomb)
                    tws = q_mod._term_weights(
                        lists, norms, np.float32, tag=codec.tag + ttag
                    )
                if not lists:
                    continue
                per_term = pdf.drop_duplicates("term").set_index("term")
                weights = {
                    t: q_mod._q_weight(per_term.loc[t, "qtf"], per_term.loc[t, "df"], nd, np.float32)
                    for t in lists
                }
                maxw = {t: float(per_term.loc[t, "max_weight"]) for t in lists}
                if mode == "wand":
                    q_mod._kernel_wand(lists, tws, weights, maxw, np.float32, qid, k, nd)
                elif mode == "wand_bmw":
                    from partitioned_ef_ans_spark.index.blockmax import build_bmw_meta

                    bmeta = build_bmw_meta(pdf, weights, terms=lists)
                    q_mod._kernel_wand_bmw(
                        lists, tws, weights, maxw, bmeta, np.float32, qid, k, nd
                    )
                elif mode == "maxscore":
                    q_mod._kernel_maxscore(lists, tws, weights, maxw, np.float32, qid, k, nd)
                elif mode == "taat":
                    q_mod._kernel_taat_pruned(lists, tws, weights, maxw, np.float32, qid, k)
                elif mode == "ranked_or":
                    q_mod._kernel_ranked_or(lists, tws, weights, np.float32, qid, k)
                else:
                    q_mod._kernel_ranked_and(lists, tws, weights, np.float32, qid, k, len(c))
                if run:
                    lat.append((time.perf_counter() - t0) * 1e6)
        if not lat:  # every query OOV -> nothing sampled
            stats[mode] = {"mean": 0.0, "q50": 0.0, "q90": 0.0, "q95": 0.0,
                           "sampled": 0}
            continue
        arr = np.array(lat)
        stats[mode] = {
            "mean": round(float(arr.mean()), 1),
            "q50": round(float(np.percentile(arr, 50)), 1),
            "q90": round(float(np.percentile(arr, 90)), 1),
            "q95": round(float(np.percentile(arr, 95)), 1),
        }
        if mode in ("blockmax", "maxscore_blockmax"):
            c1 = bmx_mod.DECODE_COUNTERS
            ref = (c1["blocks_referenced"] - c0["blocks_referenced"]) // runs
            sco = (c1["blocks_scored"] - c0["blocks_scored"]) // runs
        elif mode in ("wand", "wand_bmw", "maxscore"):
            # chunk-lazy walks skip whole chunks without decoding —
            # report their decode work at chunk granularity instead of
            # pretending full decode (blocks_* would overstate it)
            l1 = q_mod.LAZY_COUNTERS
            cref = (
                l1["chunks_referenced"] - l0["chunks_referenced"]
            ) // runs
            ctou = (l1["chunks_touched"] - l0["chunks_touched"]) // runs
            if cref:
                stats[mode]["chunks_referenced"] = int(cref)
                stats[mode]["chunks_touched"] = int(ctou)
                stats[mode]["touched_frac"] = round(ctou / cref, 4)
            ref = sco = 0
        else:
            ref = sco = full_blocks
        if ref:
            stats[mode]["blocks_referenced"] = int(ref)
            stats[mode]["blocks_scored"] = int(sco)
            stats[mode]["scored_frac"] = round(sco / ref, 4)
    return stats
