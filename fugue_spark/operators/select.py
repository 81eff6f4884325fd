"""select / filter / assign / aggregate over the ColumnExpr facade
(reference: fugue/execution/execution_engine.py:736-939, group-key
inference from fugue/column/sql.py:50-92).

``select`` classifies its items: when any item aggregates, the
non-aggregated, non-literal items become the GROUP BY keys; literals are
attached after the aggregation. All of it compiles to a single Catalyst
plan (filter → partial agg → exchange → final agg → project), so the
inference layer adds zero runtime cost.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from fugue_spark.functions import ColumnExpr, col, ensure_column

__all__ = ["select", "filter", "assign", "aggregate"]


def _to_expr(c: Any) -> ColumnExpr:
    if isinstance(c, ColumnExpr):
        return c
    if isinstance(c, str):
        return col(c)
    raise ValueError(f"select items must be ColumnExpr or str, got {c!r}")


def _out_name(e: ColumnExpr, i: int) -> str:
    if e.output_name:
        return e.output_name
    raise ValueError(
        f"select item #{i} needs an alias (.alias('name')) so output "
        "column names are deterministic"
    )


def select(
    df: DataFrame,
    *columns: Any,
    where: "ColumnExpr | None" = None,
    having: "ColumnExpr | None" = None,
) -> DataFrame:
    if not columns:
        raise ValueError("select requires at least one column")
    exprs = [_to_expr(c) for c in columns]
    if any(e.is_star for e in exprs):
        if len(exprs) > 1:
            raise ValueError("all_cols() must be the only select item")
        out = df.filter(ensure_column(where)) if where is not None else df
        if having is not None:
            raise ValueError("HAVING requires an aggregation")
        return out
    if where is not None:
        df = df.filter(ensure_column(where))
    # duplicate OUTPUT names are an error, as in the reference
    # (SelectColumns.assert_all_with_names, fugue/column/sql.py — Spark
    # itself would silently produce an ambiguous duplicate column)
    out_names = [e.output_name for e in exprs if e.output_name]
    dups = {n for n in out_names if out_names.count(n) > 1}
    if dups:
        raise ValueError(f"duplicate output column names in select: {sorted(dups)}")
    has_agg = any(e.has_agg for e in exprs)
    if not has_agg:
        if having is not None:
            raise ValueError("HAVING requires an aggregation")
        return df.select(*[ensure_column(e) for e in exprs])
    names = [_out_name(e, i) for i, e in enumerate(exprs)]
    keys = [
        ensure_column(e)
        for e in exprs
        if not e.has_agg and not e.is_literal
    ]
    aggs = [ensure_column(e).alias(n) for e, n in zip(exprs, names) if e.has_agg]
    grouped = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    # attach literals, then project to the requested order
    for e, n in zip(exprs, names):
        if e.is_literal and not e.has_agg:
            grouped = grouped.withColumn(n, ensure_column(e))
    out = grouped.select(*names)
    if having is not None:
        out = out.filter(ensure_column(having))
    return out


def filter(df: DataFrame, condition: Any) -> DataFrame:  # noqa: A001
    return df.filter(ensure_column(condition))


def assign(df: DataFrame, **columns: Any) -> DataFrame:
    exprs = {}
    for name, e in columns.items():
        if isinstance(e, ColumnExpr) and e.has_agg:
            raise ValueError(f"assign column {name!r} cannot aggregate")
        exprs[name] = ensure_column(e)
    return df.withColumns(exprs)


def aggregate(
    df: DataFrame,
    partition_by: "list[str] | str | None" = None,
    **aggs: Any,
) -> DataFrame:
    if not aggs:
        raise ValueError("aggregate requires at least one aggregation")
    by = [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    agg_cols = []
    for name, e in aggs.items():
        if not (isinstance(e, ColumnExpr) and e.has_agg):
            raise ValueError(f"aggregate column {name!r} must be an aggregation")
        agg_cols.append(ensure_column(e).alias(name))
    return df.groupBy(*by).agg(*agg_cols) if by else df.agg(*agg_cols)
