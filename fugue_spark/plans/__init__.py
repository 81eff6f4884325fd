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
