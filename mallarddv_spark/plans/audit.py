"""Plan auditing: the scale-readiness checks the test suite applies to
every gate query, packaged as a user-facing utility.

``plan_report`` inspects a DataFrame's physical plan and counts the
signals that decide whether a pipeline survives a 100× scale-up —
shuffle exchanges, Python evaluation stages, nested-loop joins,
broadcast joins, filter pushdown, whole-stage codegen coverage.
``assert_plan`` turns the report into a one-call guard for pipeline
code and CI::

    from mallarddv_spark.plans.audit import assert_plan
    assert_plan(df, no_python_stages=True, no_nested_loop_joins=True,
                max_shuffles=2)

The suite's own invariants (``tests/test_plan_quality.py``) are the
reference usage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from mallarddv_spark.exceptions import DVConfigurationError

#: row-at-a-time / Arrow Python stages — the slow path the engine's
#: operators avoid everywhere except Arrow-batched multimodal decode
_PYTHON_STAGES = ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                  "MapInPandas", "PythonMapInArrow")


def _final_plan(df: DataFrame) -> str:
    """The executed plan's FINAL section only — AQE echoes the initial
    plan below it, which would double every count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def plan_report(df: DataFrame) -> dict:
    """Count the scale-relevant physical-plan features of ``df``.

    Keys: ``shuffle_exchanges`` (hash/range repartitions — each is a
    full data movement), ``broadcast_exchanges``, ``python_stages``,
    ``nested_loop_joins`` (the O(n·m) fallback), ``sort_merge_joins``,
    ``broadcast_hash_joins``, ``generates`` (explodes),
    ``pushed_filters`` (True when any scan carries PushedFilters),
    ``codegen_spans`` (whole-stage codegen regions — wider is better).
    """
    plan = _final_plan(df)
    return {
        "shuffle_exchanges": len(
            re.findall(r"Exchange (?:hash|range)partitioning", plan)
        ),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "python_stages": sum(plan.count(s) for s in _PYTHON_STAGES),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "generates": plan.count("Generate "),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),
        # codegen regions render as "*(n) Operator" in plan text
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def assert_plan(
    df: DataFrame,
    no_python_stages: bool = False,
    no_nested_loop_joins: bool = False,
    max_shuffles: int | None = None,
    require_pushed_filters: bool = False,
) -> dict:
    """Guard a pipeline's plan; raises ``DVConfigurationError`` naming
    every violated expectation, returns the report when clean."""
    rep = plan_report(df)
    problems = []
    if no_python_stages and rep["python_stages"]:
        problems.append(f"{rep['python_stages']} Python stage(s)")
    if no_nested_loop_joins and rep["nested_loop_joins"]:
        problems.append(f"{rep['nested_loop_joins']} nested-loop join(s)")
    if max_shuffles is not None and rep["shuffle_exchanges"] > max_shuffles:
        problems.append(
            f"{rep['shuffle_exchanges']} shuffle exchange(s) "
            f"(max {max_shuffles})"
        )
    if require_pushed_filters and not rep["pushed_filters"]:
        problems.append("no filters pushed to any scan")
    if problems:
        raise DVConfigurationError(
            "plan audit failed: " + "; ".join(problems)
        )
    return rep
