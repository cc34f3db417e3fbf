"""Physical-plan audit helpers (explain parsing)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def assert_no_cartesian(df: DataFrame) -> None:
    """Fail if the physical plan contains a cartesian / unconditioned
    broadcast-nested-loop product.

    Both shapes are O(n·m) row products. A CONDITIONED
    BroadcastNestedLoopJoin (a genuine non-equi broadcast join, shown as
    ``Join condition: (expr)`` in the node detail) is allowed; an
    unconditioned one (``Join condition: None``) is not — scalar
    attaches must go through ``joins.attach_scalar`` (a ScalarSubquery,
    no join node) so a real accidental product can't hide behind the
    "it's just a 1-row broadcast" excuse.
    """
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains CartesianProduct:\n{plan}")
    if re.search(
        r"BroadcastNestedLoopJoin\nJoin type: [^\n]+\nJoin condition: None", plan
    ):
        raise AssertionError(
            f"plan contains unconditioned BroadcastNestedLoopJoin:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    """Fail unless at least one join in the plan is broadcast-hash —
    the plan shape expected for small-dimension enrichment joins."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError(f"no BroadcastHashJoin in plan:\n{plan}")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema — verifies column pruning
    reached the reader (a 2-column projection must not read 35)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols
