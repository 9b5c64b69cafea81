"""CLI surface for the training-pipeline planes: decontam (scan and
via-index agree through real subprocesses), mix (report + written
selection), sample (md5 replay from outside Spark)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow.parquet as pq
import pytest

from tests.test_cli import SF
from tests.test_cli import run_cli_inproc as run_cli

pytestmark = pytest.mark.usefixtures()


@pytest.fixture(scope="module")
def eval_parquet(tmp_path_factory):
    """Eval set = a slice of the corpus itself (guaranteed overlap)."""
    import pyarrow as pa

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sl = tbl.filter(pa.compute.equal(pa.compute.bit_wise_and(
        tbl["doc_id"], pa.scalar(7, pa.int64())), pa.scalar(0, pa.int64())))
    out = str(tmp_path_factory.mktemp("ev") / "eval.parquet")
    pq.write_table(
        pa.table({"eval_id": sl["doc_id"], "text": sl["text"]}), out
    )
    return out


def test_cli_decontam_scan_vs_index(spark, tmp_path, eval_parquet):
    idx = f"/dev/shm/pefa_cli_dc_{os.getpid()}"
    shutil.rmtree(idx, ignore_errors=True)
    try:
        scan = run_cli(
            "decontam", "--corpus", f"{SF}/documents.parquet",
            "--eval", eval_parquet, "--n", "3",
            "--min-overlap", "0.5", "--drop-list",
        )
        assert scan.strip(), "scan drop-list is empty (vacuous test)"
        run_cli(
            "create_freq_index", "block_ansmsbmedmaxmerged",
            f"{SF}/documents.parquet", idx, "--ngram", "3",
        )
        via = run_cli(
            "decontam", "--via-index", idx, "--eval", eval_parquet,
            "--n", "3", "--min-overlap", "0.5", "--drop-list",
        )
        assert via == scan
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_cli_mix_report_and_selection(spark, tmp_path, eval_parquet):
    out = str(tmp_path / "mix.parquet")
    rep = run_cli(
        "mix", f"{SF}/documents.parquet", "--eval", eval_parquet,
        "--rates", "en=1.0,de=1.0,es=1.0,fr=1.0,zh=1.0",
        "--quality-min", "0.0", "--n", "3", "--max-overlap", "0.5",
        "--out", out,
    )
    lines = [l.split("\t") for l in rep.strip().splitlines() if l]
    assert lines and all(len(p) == 3 for p in lines)
    sel = pq.read_table(out)
    # rate 1.0 everywhere + quality 0: selection = dedup'd, clean pool;
    # every eval doc itself (overlap 1.0 >= 0.5) must be gone
    kept = set(sel["doc_id"].to_pylist())
    assert kept
    ev = set(pq.read_table(eval_parquet)["eval_id"].to_pylist())
    assert not (kept & ev)
    # the report's doc counts sum to the selection size
    assert sum(int(p[1]) for p in lines) == len(kept)


def test_cli_sample_rates_md5_replay(spark, tmp_path):
    from partitioned_ef_ans_spark.operators.sampling import HASH_SPACE

    got = {
        int(l)
        for l in run_cli(
            "sample", f"{SF}/documents.parquet",
            "--rates", "en=0.4", "--seed", "s1",
        ).strip().splitlines()
        if l
    }
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang"])
    want = set()
    for i, lang in zip(tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist()):
        h = int(hashlib.md5(f"s1:{i}".encode()).hexdigest()[:15], 16)
        if lang == "en" and h < int(0.4 * HASH_SPACE):
            want.add(i)
    assert got == want and want
