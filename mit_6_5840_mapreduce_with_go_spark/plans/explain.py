"""Physical-plan inspection helpers — the feedback loop for the scale
contract ("is the filter pushed down? did the dim join broadcast? is the
expression inside codegen?"). Used by tests/test_plans.py to pin plan
properties, not just results.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_has(df: DataFrame, needle: str) -> bool:
    return needle in physical_plan(df)


def assert_pushed_filter(df: DataFrame) -> None:
    plan = physical_plan(df)
    compact = plan.replace(" ", "")
    if "PushedFilters:[" not in compact or "PushedFilters:[]" in compact:
        raise AssertionError(f"no pushed filters in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"no broadcast join in plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"cartesian product in plan:\n{plan}")


def assert_codegen(df: DataFrame) -> None:
    # Under AQE the codegen spans only appear in the FINAL plan — execute
    # first so explain() reflects it (isFinalPlan=true).
    plan = physical_plan(df)
    if "isFinalPlan=false" in plan:
        df.collect()
        plan = physical_plan(df)
    # "formatted" mode marks codegen stages as "[codegen id : N]";
    # "simple" mode prints "WholeStageCodegen" — accept either.
    if "WholeStageCodegen" not in plan and "codegen id" not in plan:
        raise AssertionError(f"no whole-stage codegen span in plan:\n{plan}")
