"""Physical-plan inspection helpers — the feedback loop for scale work.

``plan_text(df)`` returns the formatted plan; the ``assert_*`` helpers turn
"did Catalyst do what I designed for?" into testable properties: filters
pushed to the parquet scan, joins broadcast instead of shuffled, no
Python-UDF evaluation nodes in hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scan_pushdown_info(df: DataFrame) -> str:
    """The scan-related lines (PushedFilters / ReadSchema) of the plan."""
    return "\n".join(
        line
        for line in plan_text(df).splitlines()
        if "PushedFilters" in line or "ReadSchema" in line
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    info = scan_pushdown_info(df)
    assert fragment in info, f"filter {fragment!r} not pushed to scan:\n{info}"


def assert_broadcast_join(df: DataFrame) -> None:
    text = plan_text(df)
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text, (
        f"no broadcast join in plan:\n{text[:2000]}"
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    text = plan_text(df)
    assert "SortMergeJoin" not in text and "ShuffledHashJoin" not in text, (
        f"plan contains a shuffled join:\n{text[:2000]}"
    )


def assert_no_python_row_udf(df: DataFrame) -> None:
    """Arrow-batched (ArrowEvalPython / MapInPandas) is allowed; row-at-a-time
    BatchEvalPython is the slow path we ban from hot paths."""
    text = plan_text(df)
    assert "BatchEvalPython" not in text, (
        f"row-at-a-time Python UDF in plan:\n{text[:2000]}"
    )


def scale_killer_flags(df: DataFrame) -> list[str]:
    """Scan a plan for the two patterns that are NEVER acceptable in this
    repo's query catalog, whatever the operator (the 100 TB checklist's
    hard lines): an unconditioned cartesian product (CartesianProduct —
    note BroadcastNestedLoopJoin is allowed: every crossJoin in the catalog
    broadcasts a scalar/tiny side by design) and a row-at-a-time Python
    UDF (BatchEvalPython; Arrow-batched nodes are the sanctioned Python
    path). Inspects the PRE-execution physical plan, so sweeping the whole
    catalog doesn't execute it; tests/test_plan_health.py runs this over
    every catalog builder so a new query can't land with a scale-killer
    plan unnoticed."""
    text = plan_text(df)
    flags = []
    if "CartesianProduct" in text:
        flags.append("cartesian-product")
    if "BatchEvalPython" in text:
        flags.append("row-python-udf")
    return flags


def has_nonempty_pushed_filters(df: DataFrame) -> bool:
    """True if at least one scan in the plan reports a non-empty
    PushedFilters list — the 'did my predicate reach parquet' pin."""
    import re

    return bool(re.search(r"PushedFilters: \[[^\]]", plan_text(df)))


def executed_plan_text(df: DataFrame) -> str:
    """Final physical plan after execution — under AQE the pre-execution
    plan is a placeholder (isFinalPlan=false) with no codegen markers, so
    this runs the query (collect) and reads the materialized plan."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the *executed* plan —
    operators inside codegen print with a ``*(N)`` stage marker."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", executed_plan_text(df))))
