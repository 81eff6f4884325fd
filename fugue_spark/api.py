"""Functional public API — the eager surface of the engine
(reference shape: fugue/execution/api.py; here "eager" is just a thin call,
Spark stays lazy until an action)."""

from __future__ import annotations

from fugue_spark.frame import (
    alter_columns,
    as_array,
    as_arrow,
    as_dicts,
    as_pandas,
    drop_columns,
    get_metadata,
    head,
    peek_dict,
    peek_row,
    persist,
    rename,
    select_columns,
    set_metadata,
    unpersist,
    with_metadata,
)
from fugue_spark.operators import (
    aggregate,
    asof_join,
    assign,
    broadcast,
    distinct,
    dropna,
    fillna,
    filter,
    hash_sample,
    hash_sample_stratified,
    intersect,
    join,
    range_join,
    sample,
    select,
    subtract,
    take,
    union,
)
from fugue_spark.cotransform import cotransform
from fugue_spark.partition import PartitionSpec, apply_partition_spec as repartition
from fugue_spark.transform import PartitionCursor, Transformer, out_transform, transform
from fugue_spark.schema import parse_schema
from fugue_spark.session import get_spark
from fugue_spark.sources import load_df as load, save_df as save


def inner_join(df1, df2, on=None):
    return join(df1, df2, "inner", on)


def semi_join(df1, df2, on=None):
    return join(df1, df2, "semi", on)


def anti_join(df1, df2, on=None):
    return join(df1, df2, "anti", on)


def left_outer_join(df1, df2, on=None):
    return join(df1, df2, "left_outer", on)


def right_outer_join(df1, df2, on=None):
    return join(df1, df2, "right_outer", on)


def full_outer_join(df1, df2, on=None):
    return join(df1, df2, "full_outer", on)


def cross_join(df1, df2):
    return join(df1, df2, "cross")


def as_fugue_df(data, schema=None, spark=None):
    """Coerce anything this engine can ingest (pandas/arrow/list-of-rows/
    Spark DataFrame) into a Spark DataFrame, optionally casting to
    ``schema`` (reference: fugue/dataframe/api.py as_fugue_df — here the
    engine dataframe IS the Spark DataFrame, no wrapper)."""
    from fugue_spark.ingest import to_df

    return to_df(spark or get_spark(), data, schema)


def normalize_column_names(df):
    """Rename columns that violate identifier rules ([A-Za-z_][A-Za-z0-9_]*)
    to safe names and return ``(renamed_df, undo_map)`` where ``undo_map``
    maps each NEW name back to the ORIGINAL so ``rename(out, undo_map)``
    restores it (reference: fugue/dataframe/api.py:301
    normalize_column_names; rules from triad's normalize_names —
    ``["*a","-a"] -> {"_a": "*a", "_a_1": "-a"}``, digits prefix ``_``)."""
    import re as _re

    cols = list(df.columns)
    taken = set(cols)
    mapping: dict[str, str] = {}  # old -> new, changed names only
    for c in cols:
        safe = _re.sub(r"[^A-Za-z0-9_]", "_", str(c))
        if safe == "" or safe[0].isdigit():
            safe = "_" + safe
        if safe == c:
            continue
        base, i = safe, 1
        while safe in taken or safe in mapping.values():
            safe = f"{base}_{i}"
            i += 1
        mapping[c] = safe
        taken.discard(c)
    if not mapping:
        return df, {}
    return rename(df, mapping), {v: k for k, v in mapping.items()}
