"""Plan inspection helpers: the feedback loop behind PLANS.md.

`scan_summary` extracts the facts that matter for a 100 TB review —
which columns each scan reads (pruning), which filters reached it
(pushdown), how many exchanges (shuffles) the plan contains, and
whether a Python stage (ArrowEvalPython / MapInPandas / BatchEvalPython)
appears where it shouldn't.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    n_scans: int
    read_schemas: list[str]
    pushed_filters: list[str]
    n_exchanges: int
    python_stages: list[str]
    has_whole_stage_codegen: bool

    def assert_no_python(self) -> None:
        assert not self.python_stages, f"unexpected python stages: {self.python_stages}"


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_summary(df: DataFrame) -> PlanSummary:
    plan = physical_plan(df)
    return PlanSummary(
        n_scans=plan.count("FileScan"),
        read_schemas=re.findall(r"ReadSchema: (struct<[^\n]*)", plan),
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m
        ],
        n_exchanges=len(re.findall(r"\bExchange\b", plan)),
        python_stages=re.findall(
            r"\b(ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)\b",
            plan,
        ),
        has_whole_stage_codegen="WholeStageCodegen" in plan.replace("*", "WholeStageCodegen")
        if "*" in plan
        else "WholeStageCodegen" in plan,
    )
