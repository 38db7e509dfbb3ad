"""Plan introspection as an engine API: the scale-relevant counts of a
DataFrame's physical plan (scans / pushed filters / shuffles /
broadcasts / Python stages), plus assertion helpers for tests.

``scale_audit.py`` at the repo root renders SCALE.md from these same
counts; operators' tests use ``plan_metrics`` to pin plan shapes (e.g.
"one exchange for the three funnel windows") so a regression in plan
quality fails CI rather than only showing up at 100 TB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanMetrics:
    scans: int           # parquet scans (each is a pass over a table)
    pushed_filters: int  # scans with a non-empty PushedFilters list
    shuffles: int        # Exchange hash/range/single (the scale currency)
    broadcasts: int      # BroadcastExchange (small side stays small)
    python_stages: int   # MapInPandas / ArrowEvalPython (the slow path)
    codegen_spans: int   # WholeStageCodegen regions — 0 before execution
                         # under AQE (markers appear in the final plan)


def plan_metrics(df: DataFrame) -> PlanMetrics:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanMetrics(
        scans=plan.count("Scan parquet"),
        pushed_filters=len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        shuffles=len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        broadcasts=plan.count("BroadcastExchange"),
        python_stages=plan.count("MapInPandas") + plan.count("ArrowEvalPython"),
        codegen_spans=plan.count("*("),
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()
