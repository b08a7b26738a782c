"""Physical-plan inspection helpers — the feedback loop for scale tuning.

Used in tests and ad-hoc tuning to assert plan properties that matter at
100 TB: filters actually pushed to the parquet scan, projections pruned,
broadcast joins chosen for dims, no unexpected cartesian products.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def static_plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """Plan text with AQE disabled for the build — AQE wraps the plan in
    AdaptiveSparkPlan(isFinalPlan=false) until an action runs, hiding
    codegen spans and final strategies; the static planner shows them
    up-front. Re-derives the plan from the logical plan under the flag."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # Physical planning is lazy and happens at first explain, so
        # toggling the conf before the first explain of this DataFrame
        # is sufficient (pass a freshly-built DataFrame here).
        return plan_text(df, mode)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines from the formatted plan (parquet scans only)."""
    return [
        line.strip()
        for line in plan_text(df).splitlines()
        if "PushedFilters" in line
    ]


def assert_no_cartesian(df: DataFrame) -> None:
    text = plan_text(df)
    assert "CartesianProduct" not in text, f"unexpected cartesian product:\n{text}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    text = plan_text(df)
    n = text.count("BroadcastHashJoin") + text.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins:\n{text}"


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines — verify column pruning reached the scan."""
    return [
        line.strip()
        for line in plan_text(df).splitlines()
        if "ReadSchema" in line
    ]
