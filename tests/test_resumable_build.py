"""Resumable build: kill mid-encode, rerun, verify completed parts are
skipped and the final index equals a clean one (north_rule resumability
+ lineage)."""

from __future__ import annotations

import json
import shutil

import pytest

from partitioned_ef_ans_spark.index import build as b_mod
from partitioned_ef_ans_spark.index.checkpoint import (
    BuildInterrupted,
    build_index_resumable,
)


@pytest.fixture()
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


def test_kill_and_resume(spark, docs, tmp_path):
    out = str(tmp_path / "ix")
    with pytest.raises(BuildInterrupted):
        build_index_resumable(
            spark, docs, out, codec="ans", num_parts=4,
            chunk_postings=256, fail_after_parts=2,
        )
    with open(f"{out}/checkpoints.jsonl") as fh:
        n_before = len(fh.readlines())
    assert n_before == 2

    metrics = build_index_resumable(
        spark, docs, out, codec="ans", num_parts=4, chunk_postings=256
    )
    assert metrics["parts_skipped_resume"] == 2
    assert metrics["parts_encoded_this_run"] == 2

    # final index content == clean single-shot build
    clean = str(tmp_path / "clean")
    m2 = build_index_resumable(
        spark, docs, clean, codec="ans", num_parts=4, chunk_postings=256
    )
    assert m2["total_postings"] == metrics["total_postings"]
    assert m2["payload_bytes"] == metrics["payload_bytes"]

    a = spark.read.parquet(f"{out}/index.parquet")
    b = spark.read.parquet(f"{clean}/index.parquet")
    cols = ["term", "chunk_id", "n", "first_doc", "last_doc", "payload"]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_rerun_is_noop(spark, docs, tmp_path):
    out = str(tmp_path / "ix")
    build_index_resumable(spark, docs, out, codec="ans", num_parts=3, chunk_postings=256)
    m = build_index_resumable(spark, docs, out, codec="ans", num_parts=3, chunk_postings=256)
    assert m["parts_encoded_this_run"] == 0
    assert m["parts_skipped_resume"] == 3
