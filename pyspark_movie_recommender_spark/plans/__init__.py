"""Plan inspection: programmatic access to Catalyst's physical plans.

The engine never hand-builds plans (SURVEY.md §3 — declare, let
Catalyst/AQE pick strategies), but it does VERIFY them: these helpers
turn ``explain()`` output into assertable facts (did the filter reach
the scan? did the dimension broadcast? is the top-k a
TakeOrderedAndProject?). tests/test_plans.py pins the plan shapes the
100 TB design depends on, so a regression that silently introduces a
full sort or a lost pushdown fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-optimization, pre-execution) —
    same string ``df.explain('formatted')`` prints."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a predicate mentioning ``fragment`` reached the scan."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read by each scan (column pruning evidence)."""
    out = []
    for line in physical_plan(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.strip())
    return out


def has_operator(df: DataFrame, name: str) -> bool:
    """Physical operator presence, e.g. 'TakeOrderedAndProject',
    'BroadcastHashJoin', 'WindowGroupLimit', 'HashAggregate'."""
    return name in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower is better; AQE may
    remove some at runtime that still appear here)."""
    plan = physical_plan(df)
    return plan.count("Arguments: hashpartitioning") + plan.count(
        "Arguments: rangepartitioning"
    )


def unpartitioned_windows(df: DataFrame) -> tuple[int, int]:
    """Count logical Window nodes with an EMPTY partitionSpec — the
    single-task-sort scale cliff — returning (total, fact_sized):
    ``fact_sized`` counts those with no Aggregate / GlobalLimit /
    Expand anywhere below them, i.e. windows whose input is still
    raw-relation-sized. A plan is 100-TB-safe when fact_sized == 0;
    post-aggregation global windows (a 10-row decile cumsum) are fine
    and stay out of the second count.
    """
    plan = df._jdf.queryExecution().optimizedPlan()

    def walk(node):
        yield node
        cs = node.children()
        for i in range(cs.size()):
            yield from walk(cs.apply(i))

    def reduced_below(node) -> bool:
        for d in walk(node):
            if d is node:
                continue
            nm = d.getClass().getSimpleName()
            if nm in ("Aggregate", "GlobalLimit", "Expand", "Deduplicate"):
                return True
        return False

    total = fact_sized = 0
    for n in walk(plan):
        if (
            n.getClass().getSimpleName() == "Window"
            and n.partitionSpec().isEmpty()
        ):
            total += 1
            if not reduced_below(n):
                fact_sized += 1
    return total, fact_sized
