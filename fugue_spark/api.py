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
    sample_per_key,
    temperature_mix,
    intersect,
    join,
    range_join,
    sample,
    select,
    subtract,
    take,
    union,
)
from fugue_spark.context import (  # noqa: F401
    clear_global_engine,
    engine_context,
    get_context_engine,
    raw_sql,
    run_engine_function,
    set_global_engine,
)
from fugue_spark.cotransform import cotransform
from fugue_spark.dag import FugueWorkflow, FugueWorkflowError, WorkflowDataFrame  # noqa: F401
from fugue_spark.partition import PartitionSpec, apply_partition_spec as repartition
from fugue_spark.transform import PartitionCursor, Transformer, out_transform, transform
from fugue_spark.schema import parse_schema
from fugue_spark.session import get_spark
from fugue_spark.sources import load_df as load, save_df as save


# --------------------------------------------------------------------------
# input coercion (reference fugue/execution/api.py: every df argument goes
# through as_fugue_dataset, so `fa.union(spark_df, pandas_df)` works). Any
# pandas DataFrame / arrow Table operand is ingested onto the resolved
# session; Spark DataFrames pass through untouched. Internal modules import
# the strict operators directly — coercion lives only at this api boundary.


def _coerce_df(obj):
    if obj is None or isinstance(obj, _SparkDataFrame):
        return obj
    import pandas as _pd
    import pyarrow as _pa

    if isinstance(obj, (_pd.DataFrame, _pa.Table)):
        return as_fugue_df(obj)
    return obj


def _ingests(*positions):
    """Wrap fn so the df-like positional args at ``positions`` (and a
    ``df``/``df1``/``df2`` kwarg) are coerced via :func:`_coerce_df`."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def w(*args, **kw):
            args = list(args)
            for i in positions:
                if i < len(args):
                    args[i] = _coerce_df(args[i])
            for k in ("df", "df1", "df2"):
                if k in kw:
                    kw[k] = _coerce_df(kw[k])
            return fn(*args, **kw)

        return w

    return deco


union = _ingests(0, 1)(union)
subtract = _ingests(0, 1)(subtract)
intersect = _ingests(0, 1)(intersect)
join = _ingests(0, 1)(join)
asof_join = _ingests(0, 1)(asof_join)
range_join = _ingests(0, 1)(range_join)
for _n in (
    "aggregate", "assign", "broadcast", "distinct", "dropna", "fillna",
    "filter", "sample", "select", "take", "transform", "out_transform",
    "repartition", "save", "hash_sample", "hash_sample_stratified", "temperature_mix",
    "sample_per_key",
):
    globals()[_n] = _ingests(0)(globals()[_n])
del _n


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

    from fugue_spark.context import current_spark

    return to_df(spark or current_spark(), data, schema)


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


# ---------------------------------------------------------------------------
# dataset/dataframe inspection utilities (reference fugue/dataset/api.py +
# fugue/dataframe/api.py). The engine dataframe IS the Spark DataFrame, so
# most of these are thin, honest adapters. The engine-selection forms
# (set_global_engine / get_context_engine / run_engine_function) live in
# context.py as single-engine equivalents; only the multi-backend registry
# machinery itself has no counterpart — SURVEY §7: Spark is the only engine.

from pyspark.sql import DataFrame as _SparkDataFrame  # noqa: E402


def is_df(obj) -> bool:
    """True iff ``obj`` is this engine's dataframe type (reference
    fugue/dataframe/api.py is_df)."""
    return isinstance(obj, _SparkDataFrame)


def is_local(df) -> bool:
    """A Spark DataFrame is never a local (in-driver) dataset — reference
    fugue/dataset/api.py is_local; use :func:`as_pandas` to localize."""
    return not isinstance(df, _SparkDataFrame)


def is_bounded(df) -> bool:
    """Batch frames are bounded; Structured-Streaming frames are not
    (reference fugue/dataset/api.py is_bounded)."""
    return not df.isStreaming


def is_empty(df) -> bool:
    """True iff the frame has no rows — probes ONE row, never counts
    (reference fugue/dataset/api.py is_empty)."""
    return df.isEmpty()


def count(df) -> int:
    """Row count (reference fugue/dataset/api.py count)."""
    return df.count()


def show(df, n: int = 10, with_count: bool = False, title: "str | None" = None) -> None:
    """Print ``n`` rows (reference fugue/dataset/api.py show). With
    ``with_count`` the (full) row count is printed too — an extra action,
    same caveat as the reference documents."""
    if title:
        print(title)
    df.show(n)
    if with_count:
        print(f"Total count: {df.count()}")


def get_schema(df):
    """The frame's schema as this engine's compact string form (reference
    fugue/dataframe/api.py get_schema returns a Schema object; the string
    is the portable surface here)."""
    from fugue_spark.schema import schema_to_string

    return schema_to_string(df.schema)


def get_column_names(df) -> list:
    """Column names (reference fugue/dataframe/api.py get_column_names)."""
    return list(df.columns)


def get_num_partitions(df) -> int:
    """Physical partition count of the current plan (reference
    fugue/dataset/api.py get_num_partitions)."""
    return df.rdd.getNumPartitions()


def get_current_parallelism(spark=None) -> int:
    """Cluster task parallelism (reference fugue/execution/api.py
    get_current_parallelism → engine.get_current_parallelism)."""
    from fugue_spark.context import current_spark

    s = spark or current_spark()
    return s.sparkContext.defaultParallelism


def get_current_conf(spark=None) -> dict:
    """The active session's SQL RUNTIME conf as a plain dict (reference
    fugue/execution/api.py get_current_conf). ``SET`` reflects values
    changed via ``spark.conf.set`` after launch — the static
    ``sparkContext.getConf()`` would not."""
    from fugue_spark.context import current_spark

    s = spark or current_spark()
    return {r.key: r.value for r in s.sql("SET").collect()}


def peek_array(df) -> list:
    """First row as a list (reference fugue/dataframe/api.py peek_array);
    raises on an empty frame like the reference."""
    return list(peek_row(df))


def as_local(df):
    """Localize to the driver — for a Spark-native engine the local form
    is pandas (reference fugue/dataset/api.py as_local)."""
    return as_pandas(df)


as_local_bounded = as_local


def as_array_iterable(df, columns: "list | None" = None):
    """Iterate rows as lists WITHOUT materializing the whole frame on the
    driver (reference fugue/dataframe/api.py as_array_iterable —
    toLocalIterator streams one partition at a time)."""
    if columns is not None:
        df = df.select(*columns)
    for row in df.toLocalIterator():
        yield list(row)


def as_dict_iterable(df, columns: "list | None" = None):
    """Iterate rows as dicts, streaming (reference as_dict_iterable)."""
    if columns is not None:
        df = df.select(*columns)
    for row in df.toLocalIterator():
        yield row.asDict(recursive=True)


def get_native_as_df(df):
    """The engine-native frame — already a Spark DataFrame (reference
    fugue/dataframe/api.py get_native_as_df)."""
    if not isinstance(df, _SparkDataFrame):
        raise ValueError(f"not an engine dataframe: {type(df).__name__}")
    return df


def as_spark(df, schema=None, spark=None):
    """Coerce any df-like operand to a native Spark DataFrame (reference
    spark backend: fugue_spark registers ``as_spark`` on fugue.api)."""
    if isinstance(df, _SparkDataFrame):
        return df
    return as_fugue_df(df, schema=schema, spark=spark)


def fugue_sql(query: str, spark=None, **kwargs):
    """Reference-named alias of :func:`fugue_spark.sql.fsql` returning the
    single yielded frame when exactly one YIELD exists, else the result
    dict (reference fugue/sql/api.py fugue_sql semantics)."""
    from fugue_spark.sql import fsql

    res = fsql(query, spark=spark, **kwargs)
    if isinstance(res, dict) and len(res) == 1:
        return next(iter(res.values()))
    return res


class FugueSQLFlow:
    """Deferred FugueSQL workflow (reference fugue/sql/api.py
    fugue_sql_flow → FugueSQLWorkflow): holds the parsed-later script and
    its variables; nothing executes until :meth:`run`. ``run`` returns the
    yields dict (with ``.last``) exactly like :func:`fugue_spark.sql.fsql`.
    """

    def __init__(self, query: str, functions=None, **variables):
        self._query = query
        self._functions = functions
        self._variables = variables

    def run(self, spark=None, **more_variables):
        from fugue_spark.sql import fsql

        merged = dict(self._variables)
        merged.update(more_variables)
        return fsql(
            self._query, spark=spark, functions=self._functions, **merged
        )


def fugue_sql_flow(query: str, functions=None, **variables) -> FugueSQLFlow:
    """Build a deferred FugueSQL workflow; call ``.run(spark)`` to execute
    (reference fugue/sql/api.py fugue_sql_flow — the build/run split, minus
    the multi-backend engine selection SURVEY §7 excludes)."""
    return FugueSQLFlow(query, functions=functions, **variables)


def as_fugue_dataset(data, **kwargs):
    """The engine dataset of ``data`` (reference fugue/dataset/api.py
    as_fugue_dataset). In this single-engine design every dataset IS a
    Spark DataFrame, so this is :func:`as_fugue_df`."""
    return as_fugue_df(data, **kwargs)


def as_fugue_engine_df(spark, data, schema=None):
    """Convert ``data`` to this engine's dataframe on an explicit session
    (reference fugue/execution/api.py as_fugue_engine_df, with the
    SparkSession in place of the engine object)."""
    from fugue_spark.ingest import to_df

    return to_df(spark, data, schema=schema)
