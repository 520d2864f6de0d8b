"""Physical-plan introspection: make "did Catalyst do the right thing"
assertable in tests and auditable in BENCH reports.

The engine has no planner of its own (declarative DataFrames; Catalyst owns
physical strategy — SURVEY §4). What we own is *verifying* the plans: filters
pushed to the parquet scan, scans pruned to the queried term buckets, joins
broadcast where intended, Python touched only at the declared UDF points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def capture_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a filter/prune fragment shows up in the formatted plan
    (e.g. 'PushedFilters: [In(term_bucket' for bucket pruning)."""
    plan = capture_plan(df)
    assert fragment in plan, f"expected {fragment!r} in plan:\n{plan}"


def plan_summary(df: DataFrame) -> dict:
    """Coarse plan features for bench reports."""
    plan = capture_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcasts": plan.count("BroadcastExchange"),
        "wholestage": plan.count("WholeStageCodegen"),
        "python_evals": plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas"),
        "pushed_filters": "PushedFilters" in plan,
    }
