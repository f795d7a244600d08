"""Physical-plan introspection helpers.

The engine's scale story rests on plan *shapes*, not hopes: filters reach
the parquet scan, small dimensions broadcast, the Python extraction chain
stays in one shuffle-free stage, relational stages stay inside whole-stage
codegen. These helpers make those properties assertable in tests
(``tests/test_plans.py``) so a regression that silently inserts an exchange
or un-pushes a filter fails CI instead of surfacing as a 10x slowdown at
scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may later
    coalesce them, but each one is a full data reshuffle at scale)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning|\bExchange SinglePartition", plan_str(df, "simple")))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df, "simple") or "BroadcastNestedLoopJoin" in plan_str(df, "simple")


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_str(df, "simple")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' when nothing pushed)."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan_str(df, "formatted"))
    return m.group(1) if m else ""


def read_schema(df: DataFrame) -> str:
    """The ReadSchema of the scan — proves column pruning reached parquet."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan_str(df, "formatted"))
    return m.group(1) if m else ""


def python_eval_count(df: DataFrame) -> int:
    """Number of Python-evaluation operators (mapInPandas/ArrowEvalPython…)
    in the plan — the fused extraction path must show exactly one."""
    s = plan_str(df, "simple")
    return len(re.findall(r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas|MapInArrow", s))
