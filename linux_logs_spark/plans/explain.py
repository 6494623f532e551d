"""Plan inspection helpers — make .explain() assertable.

Used by tests/test_plans.py to pin the physical plans we designed for:
broadcasts actually broadcast, filters actually push into the parquet
scan, global top-k compiles to TakeOrderedAndProject, aggregates run
partial+final. A query that silently regresses to a shuffle join or a
full scan still passes correctness — these checks are what catch it.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> None:
    plan = plan_string(df, mode)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}; got:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> None:
    plan = plan_string(df, mode)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}; got:\n{plan}")
