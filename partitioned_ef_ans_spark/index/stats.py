"""Stats/verify plane: per-block-class byte accounting (V2) and the
stats line (V3).

Reference semantics (ans_block_size_stats, ans_block_posting_list.hpp:
10-136): postings and payload bytes are attributed to three classes —
``small`` (whole list shorter than one block), ``full`` (complete
blocks of full-length lists), ``last`` (the trailing partial block of
a multi-block list) — separately for the docs and freqs streams.
BPI(class) = bytes * 8 / postings.

Implementation: one mapInPandas pass over the index table; per chunk
the docs/freqs sub-block byte sizes come from the batch decoders'
consumed-size outputs (no separate bookkeeping format needed).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATS_SCHEMA = (
    "cls string, postings long, doc_bytes long, freq_bytes long, "
    "header_bytes long"
)


def _stats_factory(codec_bc):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from partitioned_ef_ans_spark.codecs import blocks as blk
        from partitioned_ef_ans_spark.codecs import vbyte

        codec = codec_bc.value
        bs = codec.block_size
        acc = {
            c: [0, 0, 0, 0] for c in ("small", "full", "last")
        }  # postings, doc_bytes, freq_bytes, header_bytes
        for pdf in batches:
            for payload in pdf["payload"]:
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                n, maxs, offs = blk.read_list_headers(buf, codec)
                nblocks = len(offs)
                ns = np.full(nblocks, bs, dtype=np.int64)
                if n % bs:
                    ns[-1] = n % bs
                bases = np.empty(nblocks, dtype=np.int64)
                bases[0] = 0
                bases[1:] = maxs[:-1].astype(np.int64) + 1
                sums = maxs.astype(np.int64) - bases - (ns - 1)
                _, dsizes = codec.decode_batch(buf, offs, ns, sums)
                _, fsizes = codec.decode_batch(
                    buf, offs + dsizes, ns, np.full(nblocks, blk.SUM_UNKNOWN)
                )
                header = int(offs[0])  # vbyte(n)+maxs+endpoints prefix
                for b in range(nblocks):
                    if n < bs:
                        cls = "small"
                    elif b == nblocks - 1 and ns[b] < bs:
                        cls = "last"
                    else:
                        cls = "full"
                    a = acc[cls]
                    a[0] += int(ns[b])
                    a[1] += int(dsizes[b])
                    a[2] += int(fsizes[b])
                # attribute the list header to the class of its first block
                acc["small" if n < bs else "full"][3] += header
        yield pd.DataFrame(
            [
                {"cls": c, "postings": a[0], "doc_bytes": a[1],
                 "freq_bytes": a[2], "header_bytes": a[3]}
                for c, a in acc.items()
            ]
        )

    return run


def block_class_stats(spark, index_df: DataFrame, codec) -> pd.DataFrame:
    """Aggregate block-class stats table (pandas; small)."""
    from partitioned_ef_ans_spark.session import ship_package

    ship_package(spark)
    from partitioned_ef_ans_spark.index.query import codec_broadcast
    codec_bc = codec_broadcast(spark, codec)
    parts = (
        index_df.select("payload")
        .mapInPandas(_stats_factory(codec_bc), schema=STATS_SCHEMA)
        .toPandas()
    )
    agg = parts.groupby("cls", as_index=False).sum()
    total = agg[["postings", "doc_bytes", "freq_bytes", "header_bytes"]].sum()
    rows = []
    for _, r in agg.iterrows():
        if r["postings"] == 0:
            continue
        rows.append(
            {
                "cls": r["cls"],
                "postings": int(r["postings"]),
                "doc_bytes": int(r["doc_bytes"]),
                "freq_bytes": int(r["freq_bytes"]),
                "docs_bpi": r["doc_bytes"] * 8 / r["postings"],
                "freqs_bpi": r["freq_bytes"] * 8 / r["postings"],
            }
        )
    rows.append(
        {
            "cls": "total",
            "postings": int(total["postings"]),
            "doc_bytes": int(total["doc_bytes"]),
            "freq_bytes": int(total["freq_bytes"]),
            "docs_bpi": total["doc_bytes"] * 8 / max(total["postings"], 1),
            "freqs_bpi": total["freq_bytes"] * 8 / max(total["postings"], 1),
        }
    )
    return pd.DataFrame(rows)


KIND_SCHEMA = "kind string, blocks long, postings long, except_bytes long"


def _kind_factory(codec_bc):
    """Per-kind decode accounting for the ANS block family
    (ans_decoding_stats.hpp:6-92 semantics): every docs/freqs block is
    one of zero_sum (dense docs run, empty payload), vbyte (short docs
    list), model0 (header byte 0) or ans; ans blocks also account
    their MSB exception side-stream bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from partitioned_ef_ans_spark.codecs import ans_msb
        from partitioned_ef_ans_spark.codecs import blocks as blk

        codec = codec_bc.value
        bs = codec.block_size
        hdr = ans_msb.VARIANTS[
            getattr(codec.docs.enc, "variant", ans_msb.DEFAULT_VARIANT)
        ][1]
        hdr_len = 3 if hdr == "bytes3" else 2
        acc: dict[str, list] = {}

        def add(kind, postings, except_bytes=0):
            a = acc.setdefault(kind, [0, 0, 0])
            a[0] += 1
            a[1] += int(postings)
            a[2] += int(except_bytes)

        for pdf in batches:
            for payload in pdf["payload"]:
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                n, maxs, offs = blk.read_list_headers(buf, codec)
                nblocks = len(offs)
                ns = np.full(nblocks, bs, dtype=np.int64)
                if n % bs:
                    ns[-1] = n % bs
                bases = np.empty(nblocks, dtype=np.int64)
                bases[0] = 0
                bases[1:] = maxs[:-1].astype(np.int64) + 1
                sums = maxs.astype(np.int64) - bases - (ns - 1)
                _, dsizes = codec.decode_batch(buf, offs, ns, sums)
                foffs = offs + dsizes
                _, fsizes = codec.decode_batch(
                    buf, foffs, ns, np.full(nblocks, blk.SUM_UNKNOWN)
                )
                for stream, soffs, ssizes, ssums in (
                    ("docs", offs, dsizes, sums),
                    ("freqs", foffs, fsizes, np.full(nblocks, -1)),
                ):
                    for b in range(nblocks):
                        if ssums[b] == 0:
                            add(f"{stream}_zero_sum", ns[b])
                        elif ssums[b] != -1 and ns[b] <= ans_msb.VBYTE_THRESHOLD:
                            add(f"{stream}_vbyte", ns[b])
                        elif buf[soffs[b]] == 0:
                            add(f"{stream}_model0", ns[b])
                        else:
                            if hdr == "packed1":
                                nwords = int(buf[soffs[b] + 1])
                                fsb = int(buf[soffs[b]] & 0xF)
                            elif hdr == "bytes3":
                                fsb = int(buf[soffs[b] + 1])
                                nwords = int(buf[soffs[b] + 2])
                            else:
                                h = (int(buf[soffs[b]]) << 8) | int(buf[soffs[b] + 1])
                                fsb = ((h >> 7) & 0x7) + 1
                                nwords = h & 0x3F
                            exc = int(ssizes[b]) - hdr_len - fsb - 4 * nwords
                            add(f"{stream}_ans", ns[b], exc)
        yield pd.DataFrame(
            [
                {"kind": k, "blocks": a[0], "postings": a[1], "except_bytes": a[2]}
                for k, a in acc.items()
            ]
        )

    return run


def ans_decode_kind_stats(spark, index_df: DataFrame, codec) -> pd.DataFrame:
    """Per-kind decode counters for an ANS-family index (A11).

    Only the ans_msb codec family has the header formats _kind_factory
    parses; ans_packed (different per-block header) and the non-ANS
    block codecs would be silently misparsed, so reject them loudly.
    """
    from partitioned_ef_ans_spark.index.build import ANS_CODEC_VARIANTS
    from partitioned_ef_ans_spark.session import ship_package

    if getattr(codec, "codec_name", None) not in ANS_CODEC_VARIANTS:
        raise ValueError(
            "ans_decode_kind_stats requires an ans_msb-family codec, got "
            f"{getattr(codec, 'codec_name', codec)!r}"
        )

    ship_package(spark)
    from partitioned_ef_ans_spark.index.query import codec_broadcast
    codec_bc = codec_broadcast(spark, codec)
    parts = (
        index_df.select("payload")
        .mapInPandas(_kind_factory(codec_bc), schema=KIND_SCHEMA)
        .toPandas()
    )
    return parts.groupby("kind", as_index=False).sum().sort_values("kind")


def stats_line(manifest: dict, class_stats: pd.DataFrame) -> dict:
    """The dump_stats JSON line (create_freq_index.cpp:170-187 spirit)."""
    tot = class_stats[class_stats["cls"] == "total"].iloc[0]
    return {
        "type": manifest.get("codec"),
        "worker_threads": None,
        "construction_time": manifest.get("build_sec"),
        "postings": int(tot["postings"]),
        "bits_per_doc": float(tot["docs_bpi"]),
        "bits_per_freq": float(tot["freqs_bpi"]),
    }
