"""Physical-plan inspection helpers.

The engine has no custom Catalyst rules (SURVEY.md §4: everything
engine-specific lives in deterministic kernels); what it owes the optimizer
instead is *plans that let Catalyst do its job* — filters that reach the
parquet scan, projections that prune columns, dimension joins that
broadcast. These helpers make those properties assertable in tests
(tests/test_plans.py), so a regression that silently un-pushes a filter or
de-broadcasts a join fails CI instead of quietly 10x-ing a scan at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries of every scan in the physical plan."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def partition_filters(df: DataFrame) -> list[str]:
    text = explain_str(df)
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", text)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning witness."""
    text = explain_str(df)
    return re.findall(r"ReadSchema: ([^\n]*)", text)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider spans = more fused JVM work)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
