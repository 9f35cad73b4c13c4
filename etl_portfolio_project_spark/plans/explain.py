"""Physical-plan inspection helpers.

The engine's performance discipline (SURVEY.md §4): filters and
projections must reach the parquet scan, small dims must broadcast,
and hot-path expressions must stay inside whole-stage codegen. These
helpers make those properties ASSERTABLE in tests instead of manual
`.explain()` eyeballing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan advertises pushed filters mentioning each
    fragment (column name etc.)."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter on {frag!r} not pushed:\n{joined}"


def assert_read_schema_only(df: DataFrame, table_fragment: str, max_cols: int) -> None:
    """Assert column pruning: the scan's ReadSchema for the matching
    scan node carries at most `max_cols` columns."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in plan:
            cols = line.split("struct<", 1)[-1].count(":")
            if cols <= max_cols:
                return
    raise AssertionError(
        f"no scan with ≤{max_cols} columns found for {table_fragment}:\n{plan}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded)."""
    import re

    # count detail headers "(n) Exchange" so tree+detail aren't doubled
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))
