"""Corpus input adapters + deterministic synthetic corpus (FIXTURES.md F1/F2).

The engine's primary input is an Iceberg/Parquet table of source-code
files ``(repo, path, commit, lang, content)`` (BASELINE.json
input_hint).  For the driver's correctness gate we adapt the provided
``documents`` table to the same shape; for engine tests/benchmarks we
synthesize a skewed corpus deterministically (seeded — no external
data), mirroring the shape of the reference's 10k-doc unit collection
(test/test_data/test_collection.sizes: min 1 / max ~61k / mean ~1.8k).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = ["python", "java", "c", "cpp", "go", "js"]
_EXT = {"python": "py", "java": "java", "c": "c", "cpp": "cc", "go": "go", "js": "js"}


def corpus_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt the driver's ``documents(doc_id,text,lang,source,n_chars)``
    table to the engine's corpus shape.  doc_id ordering is preserved via
    the path so docid assignment stays deterministic."""
    return documents.select(
        F.col("source").alias("repo"),
        F.format_string("doc/%09d.txt", F.col("doc_id")).alias("path"),
        F.sha1(F.col("text")).alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
    )


def assign_doc_ids(corpus: DataFrame) -> DataFrame:
    """Deterministic dense doc_id from (repo, path) ordering.

    Scale note: a global row_number is a single-ordering bottleneck; the
    scalable construction is repartitionByRange(repo, path) + per-
    partition counts + offset prefix-sum (see dictionary.assign_ids for
    the shared implementation).  Both give identical ids.
    """
    from partitioned_ef_ans_spark.operators.dictionary import dense_rank_ids

    return dense_rank_ids(corpus, order_cols=["repo", "path"], id_col="doc_id")


def zipf_vocab(vocab_size: int) -> list[str]:
    """Deterministic vocabulary: v0000..vN, plus stopword-like heads."""
    return [f"v{i:05d}" for i in range(vocab_size)]


def synthesize_corpus(
    spark: SparkSession,
    num_docs: int,
    vocab_size: int = 2000,
    zipf_s: float = 1.07,
    seed: int = 42,
    mean_len: int = 120,
    num_partitions: int = 8,
) -> DataFrame:
    """FIXTURES.md F1: skewed synthetic source-file corpus.

    Deterministic from (seed, num_docs, vocab_size) alone.  Document
    lengths are heavy-tailed (lognormal); term draws are Zipf so head
    terms reach df ~ N (exercises salting).  Includes one duplicated
    content pair (sha256 invariant) and empty/1-token files.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(zipf_vocab(vocab_size))
    # Zipf pmf over ranks
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    pmf = ranks ** (-zipf_s)
    pmf /= pmf.sum()
    lens = np.clip(
        rng.lognormal(mean=np.log(mean_len), sigma=1.0, size=num_docs).astype(np.int64),
        0,
        mean_len * 400,
    )
    if num_docs >= 4:
        lens[1] = 0  # empty file
        lens[2] = 1  # 1-token file
    rows = []
    for i in range(num_docs):
        toks = vocab[rng.choice(vocab_size, size=int(lens[i]), p=pmf)]
        content = " ".join(toks.tolist())
        if i == 3 and num_docs >= 4:
            content = rows[0][4]  # duplicate-content pair for sha256 checks
        repo = f"org{i % 37}/repo{i % 101}"
        lang = _LANGS[i % len(_LANGS)]
        path = f"src/m{i % 13}/f{i:07d}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}/{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    return spark.createDataFrame(rows, CORPUS_SCHEMA).repartition(num_partitions)


def synthesize_corpus_distributed(
    spark: SparkSession,
    num_docs: int,
    vocab_size: int = 20000,
    zipf_s: float = 1.07,
    seed: int = 42,
    mean_len: int = 120,
    num_partitions: int = 32,
) -> DataFrame:
    """Scalable variant of :func:`synthesize_corpus`: content generated
    on executors via mapInPandas over ``spark.range`` with a per-doc
    seeded RNG — deterministic regardless of partitioning, O(docs/cores)
    wall time, no driver materialization.  This is how the 10^12-file
    fixture would be produced on a cluster."""
    from partitioned_ef_ans_spark.session import ship_package

    ship_package(spark)

    def gen(batches):
        import numpy as np
        import pandas as pd

        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        pmf = ranks ** (-zipf_s)
        cdf = np.cumsum(pmf / pmf.sum())
        langs = _LANGS
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
            for i in ids:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                ln = int(
                    min(
                        rng.lognormal(np.log(mean_len), 1.0), mean_len * 400
                    )
                )
                if i % 1009 == 1:
                    ln = 0
                elif i % 1009 == 2:
                    ln = 1
                toks = np.searchsorted(cdf, rng.random(ln))
                content = " ".join(f"v{t:05d}" for t in toks)
                lang = langs[i % len(langs)]
                repo = f"org{i % 37}/repo{i % 101}"
                path = f"src/m{i % 13}/f{i:09d}.{_EXT[lang]}"
                commit = hashlib.sha1(f"{repo}/{path}/{seed}".encode()).hexdigest()
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(commit)
                rows["lang"].append(lang)
                rows["content"].append(content)
            import pandas as pd

            yield pd.DataFrame(rows)

    return (
        spark.range(0, num_docs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def synthesize_queries(
    num_queries: int, vocab_size: int = 2000, zipf_s: float = 1.07, seed: int = 43
) -> list[tuple[int, list[str]]]:
    """FIXTURES.md F2: Zipf-biased query set with duplicates-within-query,
    single-term queries and OOV-only queries (dropped downstream like
    transform_queries.cpp:139-160)."""
    rng = np.random.default_rng(seed)
    vocab = zipf_vocab(vocab_size)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    pmf = ranks ** (-zipf_s)
    pmf /= pmf.sum()
    out: list[tuple[int, list[str]]] = []
    for qid in range(num_queries):
        n = int(rng.integers(1, 7))
        terms = [vocab[j] for j in rng.choice(vocab_size, size=n, p=pmf)]
        if qid % 17 == 5 and n >= 2:
            terms[1] = terms[0]  # duplicate term (query_freqs multiplicity)
        if qid % 29 == 7:
            terms = ["zzqq_oov_token"] * n  # all-OOV query
        out.append((qid, terms))
    return out


def corpus_sha(corpus: DataFrame) -> DataFrame:
    """Per-row content fingerprint table (BASELINE.json per-row
    invariant: sha256(content) equality vs source)."""
    return corpus.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("sha256")
    )


def verify_corpus_sha(corpus: DataFrame, expected: DataFrame) -> int:
    """Count of rows whose sha256(content) disagrees with the recorded
    fingerprint (0 == pass).  Anti-join keeps it one shuffle; at scale
    both sides are bucketable by (repo, path)."""
    actual = corpus_sha(corpus)
    return (
        actual.join(expected, ["repo", "path", "commit"], "inner")
        .where(actual["sha256"] != expected["sha256"])
        .count()
    )
