"""Set operations with Fugue's strict-schema contract
(reference: fugue/execution/execution_engine.py:563-629).

Schemas of both sides must be identical (names, order, types); ``distinct``
switches UNION vs UNION ALL etc. All four map 1:1 onto Catalyst operators —
distinct variants plan as a hash aggregate over all columns, which AQE
sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["union", "subtract", "intersect", "distinct"]


def _check_schemas(df1: DataFrame, df2: DataFrame, op: str) -> None:
    s1 = [(f.name, f.dataType) for f in df1.schema.fields]
    s2 = [(f.name, f.dataType) for f in df2.schema.fields]
    if s1 != s2:
        raise ValueError(
            f"{op} requires identical schemas: {df1.schema.simpleString()} "
            f"vs {df2.schema.simpleString()}"
        )


def union(df1: DataFrame, df2: DataFrame, distinct: bool = True) -> DataFrame:
    _check_schemas(df1, df2, "union")
    res = df1.union(df2)
    return res.distinct() if distinct else res


def subtract(df1: DataFrame, df2: DataFrame, distinct: bool = True) -> DataFrame:
    _check_schemas(df1, df2, "subtract")
    return df1.subtract(df2) if distinct else df1.exceptAll(df2)


def intersect(df1: DataFrame, df2: DataFrame, distinct: bool = True) -> DataFrame:
    _check_schemas(df1, df2, "intersect")
    return df1.intersect(df2) if distinct else df1.intersectAll(df2)


def distinct(df: DataFrame) -> DataFrame:
    return df.distinct()
