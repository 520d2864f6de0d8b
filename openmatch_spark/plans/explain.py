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


def plan_summary(df: DataFrame, execute: bool = True) -> dict:
    """Coarse plan features for bench reports.

    execute=True runs the plan first: under AQE the formatted explain of an
    UNexecuted DataFrame is the initial logical skeleton with NO codegen
    annotations (this is why r1's bench recorded wholestage: 0 for a query
    that demonstrably runs in codegen). After execution the final adaptive
    plan carries `[codegen id : N]` markers per whole-stage span.
    """
    if execute:
        # collect(), not count(): count() wraps df in a NEW aggregate plan,
        # leaving df's own queryExecution unexecuted (and un-finalized)
        df.collect()
    plan = capture_plan(df)
    import re

    def uniq(op: str) -> int:
        # count DISTINCT operator ids: the final adaptive plan prints reused
        # subtrees more than once, but a reused exchange keeps its id
        return len(set(re.findall(rf"\((\d+)\) {op}\b", plan)))

    codegen_spans = len(set(re.findall(r"codegen id : (\d+)", plan)))
    return {
        "exchanges": uniq("Exchange") + uniq("BroadcastExchange"),
        "broadcasts": uniq("BroadcastExchange"),
        "wholestage": max(plan.count("WholeStageCodegen"), codegen_spans),
        "python_evals": uniq("ArrowEvalPython") + uniq("FlatMapGroupsInPandas") + uniq("MapInPandas"),
        "pushed_filters": "PushedFilters" in plan,
        "aqe_final": "isFinalPlan=true" in plan,
    }
