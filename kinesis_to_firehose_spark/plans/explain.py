"""Plan introspection helpers (SURVEY.md §5e).

At 100 TB the difference between a broadcast and a shuffled dim join,
or between a pushed and unpushed filter, is the whole game — these
helpers let tests assert the plan shape, not just the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastExchange" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of every scan in the plan."""
    plan = formatted_plan(df)
    return "\n".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)


def read_schemas(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(ln for ln in plan.splitlines() if "ReadSchema" in ln)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage codegen spans in the plan."""
    return physical_plan(df).count("*(")
