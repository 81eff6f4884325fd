"""zip/comap → ``cotransform``: apply a function to aligned key groups of
several dataframes.

The reference implements zip by pickling each group into blobs and unioning
(fugue/execution/execution_engine.py:962-1241); that design exists because
Fugue must stay backend-agnostic. Spark-natively the same semantics are:

* 2 inputs → ``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas`` —
  both sides shuffle once on the keys, groups stream pairwise into the UDF
  (no blob materialization, bounded by group size).
* N inputs → per-input ``groupBy(k).agg(collect_list(struct(...)))`` then a
  key join of the N grouped frames, rebuilt into pandas frames inside the
  UDF. Heavier (each group becomes one array cell) — documented as the
  N-way fallback, like the reference's blob path.

``how`` ∈ inner|left_outer|right_outer|full_outer controls which key
groups are emitted (reference zip semantics, execution_engine.py:1007-1014).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_spark.partition import PartitionSpec
from fugue_spark.schema import parse_schema
from fugue_spark.transform import PartitionCursor, _conform, _result_to_pandas

__all__ = ["cotransform"]

_HOWS = ("inner", "left_outer", "right_outer", "full_outer")


def _infer_keys(dfs: list[DataFrame], spec: PartitionSpec) -> list[str]:
    if spec.by:
        return list(spec.by)
    keys = set(dfs[0].columns)
    for d in dfs[1:]:
        keys &= set(d.columns)
    if not keys:
        raise ValueError("cotransform: no common key columns and no partition.by")
    return [c for c in dfs[0].columns if c in keys]


def cotransform(
    dfs: "list[DataFrame]",
    using: Callable,
    schema: Any,
    partition: "PartitionSpec | dict | None" = None,
    how: str = "inner",
    params: "dict | None" = None,
) -> DataFrame:
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    if len(dfs) < 2:
        raise ValueError("cotransform needs at least two dataframes")
    spec = partition if isinstance(partition, PartitionSpec) else PartitionSpec(partition)
    keys = _infer_keys(dfs, spec)
    out_schema = parse_schema(schema)
    out_cols = [f.name for f in out_schema.fields]
    kwargs = dict(params or {})

    sig_params = list(inspect.signature(using).parameters.values())
    wants_cursor = bool(sig_params) and sig_params[0].name == "cursor"
    n_data = len(sig_params) - (1 if wants_cursor else 0)
    if n_data != len(dfs):
        raise ValueError(
            f"function takes {n_data} dataframes but {len(dfs)} were zipped"
        )

    presort = spec.presort

    def run(frames: list[pd.DataFrame], kv: list[Any]) -> pd.DataFrame:
        if how == "inner" and any(len(f) == 0 for f in frames):
            return pd.DataFrame(columns=out_cols)
        if how == "left_outer" and len(frames[0]) == 0:
            return pd.DataFrame(columns=out_cols)
        if how == "right_outer" and len(frames[-1]) == 0:
            return pd.DataFrame(columns=out_cols)
        if presort:
            names = [n for n, _ in presort]
            asc = [a for _, a in presort]
            frames = [
                f.sort_values([n for n in names if n in f.columns],
                              ascending=[a for n, a in zip(names, asc) if n in f.columns],
                              na_position="last", kind="mergesort")
                if any(n in f.columns for n in names) else f
                for f in frames
            ]
        cursor = PartitionCursor(keys, kv, 0)
        args = [cursor, *frames] if wants_cursor else frames
        res = using(*args, **kwargs)
        return _conform(_result_to_pandas(res, out_cols), out_cols, "cotransform")

    if len(dfs) == 2:
        def cg_udf(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            return run([left, right], list(key))

        return (
            dfs[0].groupBy(*keys).cogroup(dfs[1].groupBy(*keys)).applyInPandas(cg_udf, schema=out_schema)
        )

    # N-way: group each input into an array-of-structs column, join on keys
    grouped = []
    for i, d in enumerate(dfs):
        payload = [c for c in d.columns if c not in keys]
        g = d.groupBy(*keys).agg(
            F.collect_list(F.struct(*payload)).alias(f"__fugue_data_{i}__")
        )
        grouped.append(g)
    joined = grouped[0]
    join_how = {"inner": "inner", "left_outer": "left", "right_outer": "right", "full_outer": "full"}[how]
    for g in grouped[1:]:
        joined = joined.join(g, on=keys, how="full" if how == "right_outer" else join_how)
    n_inputs = len(dfs)
    payload_cols = {
        f"__fugue_data_{i}__": [c for c in d.columns if c not in keys]
        for i, d in enumerate(dfs)
    }

    def nway_udf(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, row in pdf.iterrows():
            frames = []
            for i in range(n_inputs):
                cell = row[f"__fugue_data_{i}__"]
                cols = payload_cols[f"__fugue_data_{i}__"]
                if cell is None or (isinstance(cell, float) and pd.isna(cell)) or len(cell) == 0:
                    frames.append(pd.DataFrame(columns=cols))
                else:
                    frames.append(pd.DataFrame([list(x) for x in cell], columns=cols))
            outs.append(run(frames, [row[k] for k in keys]))
        if not outs:
            return pd.DataFrame(columns=out_cols)
        return pd.concat(outs, ignore_index=True)

    return joined.groupBy(*keys).applyInPandas(
        lambda pdf: nway_udf(pdf), schema=out_schema
    )
