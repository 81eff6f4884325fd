"""zip/comap → ``cotransform``: apply a function to aligned key groups of
several dataframes.

The reference implements zip by pickling each group into blobs and unioning
(fugue/execution/execution_engine.py:962-1241); that design exists because
Fugue must stay backend-agnostic. The Spark-native execution here is a
tagged union: every input is projected onto the superset schema (payload
columns prefixed per input, NULL elsewhere), unioned, hash-exchanged ONCE
on the keys, and each key group is split back into per-input pandas frames
inside mapInPandas. Versus cogroup().applyInPandas this saves a JVM↔Python
round trip per group — an order of magnitude on small groups — and it
generalizes to N inputs with the same single shuffle.

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

_PD_NUMERIC = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "bool",
}


def _union_cotransform(dfs, keys, run, out_schema):
    """Zip N dataframes as a tagged union: every input is projected onto the
    superset schema (its payload columns prefixed, others NULL), unioned,
    and hash-exchanged ONCE on the keys; inside mapInPandas each key group
    splits by tag back into per-input frames. One shuffle, one Arrow stream
    per partition — beats cogroup().applyInPandas by an order of magnitude
    when groups are small (no JVM↔Python round trip per group)."""
    payloads = [[c for c in d.columns if c not in keys] for d in dfs]
    spark_types = [
        {c: d.schema[c].dataType.simpleString() for c in cols}
        for d, cols in zip(dfs, payloads)
    ]
    parts = []
    for i, (d, cols) in enumerate(zip(dfs, payloads)):
        proj = [F.col(k) for k in keys] + [F.lit(i).alias("__tag__")]
        for j, (dj, colsj) in enumerate(zip(dfs, payloads)):
            for c in colsj:
                if i == j:
                    proj.append(F.col(c).alias(f"__in{j}__{c}"))
                else:
                    proj.append(
                        F.lit(None).cast(dj.schema[c].dataType).alias(f"__in{j}__{c}")
                    )
        parts.append(d.select(*proj))
    combined = parts[0]
    for p in parts[1:]:
        combined = combined.unionByName(p)
    # explicit count: keep AQE from byte-size-coalescing a python-heavy stage
    num = int(combined.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    combined = combined.repartition(num, *keys)
    n_inputs = len(dfs)

    in_columns = [list(d.columns) for d in dfs]

    def _norm_key(kv) -> tuple:
        kv = kv if isinstance(kv, tuple) else (kv,)
        return tuple(None if isinstance(v, float) and pd.isna(v) else v for v in kv)

    def udf(it):
        import itertools as _it

        it = iter(it)
        first = next(it, None)
        if first is None:
            return
        pdf = pd.concat(list(_it.chain([first], it)), ignore_index=True)
        # split by tag ONCE per partition (vectorized), restore dtypes per
        # side, then index groups by key tuple — per-group work is two dict
        # lookups + the user function, nothing else.
        empties: list[pd.DataFrame] = []
        group_maps: list[dict[tuple, pd.DataFrame]] = []
        key_order: dict[tuple, None] = {}
        for i in range(n_inputs):
            cols = payloads[i]
            f = pdf.loc[pdf["__tag__"] == i, keys + [f"__in{i}__{c}" for c in cols]].copy()
            f.columns = keys + cols
            # arrow widened ints/bools to float/object for NULL padding in
            # the union; restore the input dtype where no nulls remain
            for c in cols:
                want = _PD_NUMERIC.get(spark_types[i][c])
                if want and str(f[c].dtype) != want and not f[c].isna().any():
                    try:
                        f[c] = f[c].astype(want)
                    except (TypeError, ValueError):
                        pass
            f = f[in_columns[i]]
            gm: dict[tuple, pd.DataFrame] = {}
            for kv, g in f.groupby(keys, sort=False, dropna=False):
                k = _norm_key(kv)
                gm[k] = g.reset_index(drop=True)
                key_order.setdefault(k, None)
            group_maps.append(gm)
            empties.append(f.iloc[0:0])
        outs = []
        for k in key_order:
            frames = [group_maps[i].get(k, empties[i]) for i in range(n_inputs)]
            outs.append(run(frames, list(k)))
            if len(outs) >= 256:
                yield pd.concat(outs, ignore_index=True)
                outs = []
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return combined.mapInPandas(udf, schema=out_schema)


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

    return _union_cotransform(dfs, keys, run, out_schema)
