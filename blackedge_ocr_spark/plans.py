"""Physical-plan inspection helpers.

"Would this plan survive 100x?" is checked mechanically: tests assert
shuffle counts, filter pushdown, and Python-boundary counts on the
real optimized plans, so a regression that introduces an accidental
shuffle or un-pushed filter fails CI — not a code review.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Distinct shuffle nodes in the optimized physical plan (the
    formatted output prints each node in both the tree and the detail
    section, so count unique node ids)."""
    return len(set(re.findall(r"\((\d+)\) Exchange", formatted_plan(df))))


def count_python_stages(df: DataFrame) -> int:
    """Distinct Arrow/Python evaluation nodes (UDF boundaries)."""
    plan = formatted_plan(df)
    return len(
        set(
            re.findall(
                r"\((\d+)\) (?:ArrowEvalPython|MapInPandas|BatchEvalPython|"
                r"FlatMapGroupsInPandas)",
                plan,
            )
        )
    )


def scan_info(df: DataFrame) -> dict:
    """PushedFilters / ReadSchema of the first parquet scan."""
    plan = formatted_plan(df)
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    schema = re.search(r"ReadSchema: (.*)", plan)
    return {
        "pushed_filters": pushed.group(1) if pushed else "",
        "read_schema": schema.group(1).strip() if schema else "",
    }


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    """Distinct codegen region ids (formatted mode prints them as
    `[codegen id : N]` per node)."""
    return sorted(set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))))


def count_projects(df: DataFrame) -> int:
    return len(set(re.findall(r"\((\d+)\) Project", formatted_plan(df))))
