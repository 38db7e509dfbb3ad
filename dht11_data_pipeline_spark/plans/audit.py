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


def _eff_col(line: str) -> int:
    """Tree depth of a plan line: the branch-marker column (``+- `` /
    ``:- ``) when present, else the first-non-space column (AQE's
    ``== Final Plan ==`` blocks print bare indented lines)."""
    m = re.search(r"[+:]- ", line)
    if m is not None:
        return m.start()
    return len(line) - len(line.lstrip(" "))


def _subtree_end(lines: list[str], i: int, col: int) -> int:
    j = i + 1
    while j < len(lines) and _eff_col(lines[j]) > col:
        j += 1
    return j


def _block_key(lines: list[str]) -> str:
    """Identity of a cached block, independent of expression/plan/stage
    ids (which differ per reference to the same cached relation)."""
    text = "\n".join(re.sub(r"^[\s:+|-]*", "", x) for x in lines)
    text = re.sub(r"#\d+", "#", text)
    text = re.sub(r"plan_id=\d+", "plan_id=", text)
    text = re.sub(r"QueryStage \d+", "QueryStage", text)
    text = re.sub(r"\*\(\d+\)", "*()", text)
    return text


def normalize_plan(plan: str) -> str:
    """Make a physical-plan string COUNTABLE as executed work:

    - drop every ``== Initial Plan ==`` section (AQE prints the
      pre-adaptive plan next to the final one — counting both doubles
      every exchange under an executed AdaptiveSparkPlan);
    - keep each cached (persisted) relation's child plan ONCE:
      ``InMemoryRelation`` prints it at every ``InMemoryTableScan``
      reference, but Spark materializes once and serves later
      references from the cache — a 3-consumer persist would otherwise
      triple-count the shuffles/scans under it."""
    lines = plan.splitlines()
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    while i < len(lines):
        line = lines[i]
        if "== Initial Plan ==" in line:
            i = _subtree_end(lines, i, _eff_col(line))
            continue
        m = re.search(r"[+:]- InMemoryRelation|^InMemoryRelation", line)
        if m is None:
            out.append(line)
            i += 1
            continue
        j = _subtree_end(lines, i, _eff_col(line))
        key = _block_key(lines[i:j])
        if key not in seen:
            seen.add(key)
            out.append(line)
            # recurse on the child plan so nested caches / Initial
            # sections inside the kept block are normalized too
            if j > i + 1:
                out.append(normalize_plan("\n".join(lines[i + 1:j])))
        i = j
    return "\n".join(out)


def plan_metrics(df: DataFrame) -> PlanMetrics:
    plan = normalize_plan(df._jdf.queryExecution().executedPlan().toString())
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
