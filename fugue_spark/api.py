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
