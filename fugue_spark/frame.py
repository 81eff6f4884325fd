"""Per-frame ops (reference: fugue/dataframe/dataframe.py:99-274 and
fugue/dataframe/api.py): rename, drop, select_columns, alter_columns cast,
head, peek, local conversions. All stay inside Catalyst (select/cast)
except the explicit to-driver conversions, which are the caller's choice.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_spark.schema import parse_schema

__all__ = [
    "rename",
    "drop_columns",
    "select_columns",
    "alter_columns",
    "head",
    "peek_row",
    "peek_dict",
    "as_pandas",
    "as_arrow",
    "as_array",
    "as_dicts",
    "persist",
    "unpersist",
    "get_metadata",
    "set_metadata",
    "with_metadata",
]

# ---------------------------------------------------------------------------
# metadata side-car (reference: Dataset.metadata, fugue/dataset/
# dataset.py:27-43 — a ParamDict attached to the dataset object). Spark
# DataFrames are immutable plan handles, so the dict lives in a weak-keyed
# side table and the frame ops in this module propagate it to their output.

import weakref

_METADATA: "weakref.WeakKeyDictionary[DataFrame, dict]" = weakref.WeakKeyDictionary()


def get_metadata(df: DataFrame) -> dict:
    """The frame's metadata dict (mutable; empty by default)."""
    md = _METADATA.get(df)
    if md is None:
        md = {}
        _METADATA[df] = md
    return md


def set_metadata(df: DataFrame, metadata: "dict | None") -> DataFrame:
    """Replace the frame's metadata (reference Dataset.reset_metadata,
    dataset.py:39-43). Returns ``df`` for chaining."""
    _METADATA[df] = dict(metadata) if metadata else {}
    return df


def with_metadata(df: DataFrame, **kv: Any) -> DataFrame:
    """Merge keys into the frame's metadata; returns ``df`` for chaining."""
    get_metadata(df).update(kv)
    return df


def _carry_metadata(src: DataFrame, out: DataFrame) -> DataFrame:
    md = _METADATA.get(src)
    if md:
        _METADATA[out] = md  # shared dict: one logical dataset, many handles
    return out


def rename(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"cannot rename missing columns {missing}")
    new_names = [columns.get(c, c) for c in df.columns]
    if len(set(new_names)) != len(new_names):
        raise ValueError(f"rename produces duplicate columns: {new_names}")
    return _carry_metadata(df, df.toDF(*new_names))


def drop_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"cannot drop missing columns {missing}")
    if len(columns) >= len(df.columns):
        raise ValueError("cannot drop all columns")
    return _carry_metadata(df, df.drop(*columns))


def select_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"cannot select missing columns {missing}")
    return _carry_metadata(df, df.select(*[_qcol(c) for c in columns]))


def _is_float(dt: T.DataType) -> bool:
    return isinstance(dt, (T.FloatType, T.DoubleType))


def _qcol(name: str):
    """Exact-name column reference (backtick-quoted so '.' is literal)."""
    return F.col("`" + name.replace("`", "``") + "`")


def alter_columns(df: DataFrame, schema: "str | T.StructType") -> DataFrame:
    """Cast a subset of columns to new types; other columns untouched;
    column order preserved. Float→int/str casts route NaN to NULL first
    (the reference's guard, fugue_spark/_utils/convert.py:92-96 — pandas
    NaN would otherwise stringify as 'NaN' or overflow an int cast).
    """
    changes = {f.name: f.dataType for f in parse_schema(schema).fields}
    missing = [c for c in changes if c not in df.columns]
    if missing:
        raise ValueError(f"cannot alter missing columns {missing}")
    cur = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for name in df.columns:
        if name not in changes or changes[name] == cur[name]:
            cols.append(_qcol(name))
            continue
        target = changes[name]
        c = _qcol(name)
        if _is_float(cur[name]) and not _is_float(target):
            c = F.when(F.isnan(c), F.lit(None)).otherwise(c)
        cols.append(c.cast(target).alias(name))
    return _carry_metadata(df, df.select(*cols))


def head(df: DataFrame, n: int, columns: "list[str] | None" = None) -> DataFrame:
    if columns is not None:
        df = select_columns(df, columns)
    return _carry_metadata(df, df.limit(n))


def peek_row(df: DataFrame) -> tuple:
    row = df.first()
    if row is None:
        raise ValueError("cannot peek an empty dataframe")
    return tuple(row)


def peek_dict(df: DataFrame) -> dict[str, Any]:
    row = df.first()
    if row is None:
        raise ValueError("cannot peek an empty dataframe")
    return row.asDict(recursive=False)


def as_pandas(df: DataFrame) -> pd.DataFrame:
    return df.toPandas()


def as_arrow(df: DataFrame):
    return df.toArrow()


def as_array(df: DataFrame, columns: "list[str] | None" = None) -> list[list[Any]]:
    if columns is not None:
        df = select_columns(df, columns)
    return [list(r) for r in df.collect()]


def as_dicts(df: DataFrame, columns: "list[str] | None" = None) -> list[dict[str, Any]]:
    if columns is not None:
        df = select_columns(df, columns)
    return [r.asDict(recursive=False) for r in df.collect()]


def persist(df: DataFrame, lazy: bool = False) -> DataFrame:
    """Cache (MEMORY_AND_DISK); eager persist forces materialization via
    count (reference: fugue_spark/execution_engine.py:737-748 behavior)."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if not lazy:
        df.count()
    return df


def unpersist(df: DataFrame) -> DataFrame:
    return df.unpersist()
