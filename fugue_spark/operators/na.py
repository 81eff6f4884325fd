"""Null handling (reference: fugue/execution/execution_engine.py:642-681).

Both map 1:1 onto ``DataFrameNaFunctions``; validation mirrors the
reference: fillna forbids null fill values, and a dict value ignores
``subset``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = ["dropna", "fillna"]


def dropna(
    df: DataFrame,
    how: str = "any",
    thresh: "int | None" = None,
    subset: "list[str] | None" = None,
) -> DataFrame:
    if how not in ("any", "all"):
        raise ValueError(f"how must be 'any' or 'all', got {how!r}")
    return df.dropna(how=how, thresh=thresh, subset=subset)


def fillna(df: DataFrame, value: Any, subset: "list[str] | None" = None) -> DataFrame:
    if isinstance(value, dict):
        if any(v is None for v in value.values()) or len(value) == 0:
            raise ValueError(f"fillna mapping must be non-empty with non-null values: {value}")
        return df.fillna(value)
    if value is None:
        raise ValueError("fillna value cannot be None")
    return df.fillna(value, subset=subset)
