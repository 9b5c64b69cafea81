"""PEF list codec: the reference's `opt` index family for whole lists.

Per list (freq_index.hpp:35-47 prefix conventions + index_types.hpp
`opt` = partitioned_sequence<indexed_sequence> docIDs and
positive_sequence<partitioned_sequence<strict_sequence>> freqs):

  γ_nonzero(n) γ_nonzero(occurrences)
  partitioned_sequence<indexed>(doc_ids, universe=num_docs)
  partitioned_sequence<strict>(prefix_sums(freqs), universe=occ+1)

docIDs use the GLOBAL num_docs universe like the reference (stored in
the index manifest, not per payload).  Frequencies are prefix-summed
(positive_sequence.hpp) so the strict base applies.
"""

from __future__ import annotations

import numpy as np

from partitioned_ef_ans_spark.codecs import ef


def encode_lists(
    doc_lists: list[np.ndarray], freq_lists: list[np.ndarray], num_docs: int
) -> list[bytes]:
    out = []
    for docs, freqs in zip(doc_lists, freq_lists):
        n = len(docs)
        occ = int(np.sum(freqs))
        bw = ef.BitWriter()
        ef.write_gamma_nonzero(bw, n)
        ef.write_gamma_nonzero(bw, occ)
        ef.partitioned_write(bw, np.asarray(docs, dtype=np.int64), num_docs, n,
                             base_seq="indexed")
        csum = np.cumsum(np.asarray(freqs, dtype=np.int64))
        ef.partitioned_write(bw, csum, occ + 1, n, base_seq="strict")
        out.append(bw.tobytes())
    return out


def partition_counts(payloads) -> list[tuple[int, int]]:
    """(n, doc-sequence partitions) per list, parsed from the payload
    prefix only (γ(n) γ(occ) γ(partitions)) — the V4 partition-length
    stat (create_freq_index.cpp:200-220) without a full decode."""
    out = []
    for p in payloads:
        br = ef.BitReader(p)
        n = ef.read_gamma_nonzero(br)
        ef.read_gamma_nonzero(br)  # occurrences
        parts = ef.read_gamma_nonzero(br)
        out.append((n, parts))
    return out


def decode_lists(payloads: list[bytes], num_docs: int):
    out = []
    for p in payloads:
        br = ef.BitReader(p)
        n = ef.read_gamma_nonzero(br)
        occ = ef.read_gamma_nonzero(br)
        docs, end = ef.partitioned_decode(br, br.pos, num_docs, n, base_seq="indexed")
        csum, _ = ef.partitioned_decode(br, end, occ + 1, n, base_seq="strict")
        freqs = np.diff(csum, prepend=0)
        out.append((docs, freqs))
    return out
