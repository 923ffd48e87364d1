"""Physical-plan inspection helpers.

The engine's performance contract is checkable, not aspirational: these
helpers read ``df.explain()`` output so tests can assert that a plan actually
broadcasts its dimension, prunes its columns, and pushes its filters — the
three properties that keep the 100 TB path viable (SURVEY.md §4.2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def shuffle_exchange_count(df: DataFrame) -> int:
    # simple mode renders "Exchange hashpartitioning(...)" on one line;
    # formatted mode splits the node name from its Arguments line and would
    # make this regex count 0 for every plan.
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning)",
            plan_string(df, "simple"),
        )
    )


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema clauses of every file scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", plan_string(df))


def pushed_filters(df: DataFrame) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # simple mode marks codegen stages with "*(n)"; formatted mode spells
    # "WholeStageCodegen" — accept either rendering.
    s = plan_string(df, "simple")
    return "WholeStageCodegen" in s or "*(" in s
