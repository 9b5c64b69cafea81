"""Every queries() entry must match its oracle_sql() on sf0.001 (fast)
— the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.util_compare import compare

NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_gate_matches_oracle(spark, sf_small, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    if name not in sqls:
        df = q(spark, sf_small)
        assert df.count() >= 0
        return
    ok, msg = compare(q(spark, sf_small), sqls[name], sf_small)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
