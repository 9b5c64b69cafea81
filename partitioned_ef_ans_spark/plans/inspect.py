"""Physical-plan inspection helpers: assert the plans we designed for
are the plans Catalyst actually produces (pushdown, broadcast, no
stray shuffles).  Used by tests and by bench diagnostics."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the physical plan (each node
    appears once in the formatted detail section as '(N) Exchange')."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
    )


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column sets of every parquet scan in the plan —
    evidence of column pruning."""
    plan = formatted_plan(df)
    return [l.strip() for l in plan.splitlines() if "ReadSchema" in l]
