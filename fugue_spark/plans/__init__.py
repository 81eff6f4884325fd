"""Plan inspection utilities — the engine's "show me the physical plan"
toolbox used by tests and perf work: assert a filter pushed down, a join
broadcast, an exchange eliminated. Thin wrappers over ``explain``.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_exchange",
    "broadcast_join_count",
    "wholestage_codegen_spans",
    "plan_summary",
]


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data source (empty list = nothing pushed)."""
    out: list[str] = []
    for line in physical_plan(df).splitlines():
        m = re.search(r"PushedFilters:\s*\[(.*)\]", line)
        if m and m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the source (pruning check)."""
    cols: list[str] = []
    for line in physical_plan(df).splitlines():
        m = re.search(r"ReadSchema:\s*struct<(.*)>", line)
        if m:
            cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return cols


def has_exchange(df: DataFrame) -> bool:
    return "Exchange" in physical_plan(df, "simple")


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df, "simple").count("BroadcastHashJoin")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen regions (wider spans = more of the
    plan runs as generated JVM code)."""
    plan = physical_plan(df, "simple") + physical_plan(df, "formatted")
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


def plan_summary(df: DataFrame) -> dict:
    """One-call scale audit of a plan — the checklist every operator is
    reviewed against before it is trusted at 100 TB:

    * ``n_exchanges`` — shuffles; each is a full network materialization.
    * ``n_python_stages`` — MapInArrow/MapInPandas/etc; Python-bounded.
    * ``n_broadcast_joins`` / ``n_sortmerge_joins`` — join strategies.
    * ``cartesian`` — True if any CartesianProduct/BroadcastNestedLoopJoin
      survived (almost always a scale bug).
    * ``pushed_filters`` / ``read_columns`` — what reached the scan.
    * ``codegen_spans`` — whole-stage-codegen region count.

    Usage: ``assert not plan_summary(out)["cartesian"]`` in tests, or
    print it while iterating on an operator instead of eyeballing the
    full explain output.
    """
    simple = physical_plan(df, "simple")
    return {
        # shuffle exchanges only — BroadcastExchange is not a shuffle and
        # is reported via n_broadcast_joins instead
        "n_exchanges": len(
            re.findall(r"Exchange (?:hash|range|Single|RoundRobin)", simple)
        ),
        "n_python_stages": sum(
            simple.count(k)
            for k in ("MapInArrow", "MapInPandas", "FlatMapGroupsInPandas",
                      "ArrowEvalPython", "BatchEvalPython")
        ),
        "n_broadcast_joins": simple.count("BroadcastHashJoin"),
        "n_sortmerge_joins": simple.count("SortMergeJoin"),
        "cartesian": ("CartesianProduct" in simple)
        or ("BroadcastNestedLoopJoin" in simple),
        "pushed_filters": pushed_filters(df),
        "read_columns": read_schema_columns(df),
        "codegen_spans": wholestage_codegen_spans(df),
    }
