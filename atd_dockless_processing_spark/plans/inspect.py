"""Plan inspection utilities — verify Catalyst did what we designed.

SURVEY.md §4: the optimizations are delegated to Catalyst; these
helpers verify (not implement) them — PushedFilters on scans,
ReadSchema pruning, broadcast joins where we hinted, whole-stage
codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant physical plan facts for one query."""
    plan = formatted_plan(df)
    return {
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "exchanges": plan.count("Exchange"),
        "codegen_stages": plan.count("WholeStageCodegen"),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def explain_all(spark, sf_dir: str, keys=None) -> dict[str, dict]:
    """Build (don't execute) every registered query; report plan facts."""
    from ..registry import QUERIES

    out = {}
    for key, fn in QUERIES.items():
        if keys and key not in keys:
            continue
        try:
            out[key] = plan_report(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover
            out[key] = {"error": str(e)[:200]}
    return out
