"""Load/save for parquet, csv, json (+ stubs for lake formats).

Reference semantics (fugue/execution/execution_engine.py:1127-1168,
fugue_spark/_utils/io.py behavior):

* format inferred from the path suffix when not given;
* ``columns`` = projection (list) — pushed into the scan;
* csv: ``header`` / ``infer_schema`` params, or an explicit schema;
* save modes overwrite/append/error; ``partition_by``; ``force_single``
  writes one data file at exactly ``path`` (coalesce(1) through a temp
  dir — a deliberate anti-scale escape hatch for small exports only).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from fugue_spark.schema import parse_schema

__all__ = ["load_df", "save_df", "infer_format"]

_FORMATS = ("parquet", "csv", "json", "orc", "avro")


def infer_format(path: str) -> str:
    base = path.rstrip("/*")
    for fmt in _FORMATS:
        if base.endswith("." + fmt):
            return fmt
    raise ValueError(
        f"cannot infer format from {path!r}; pass format_hint explicitly"
    )


def load_df(
    spark: SparkSession,
    path: "str | list[str]",
    format_hint: "str | None" = None,
    columns: "list[str] | str | None" = None,
    schema: "str | None" = None,
    **params,
) -> DataFrame:
    paths = [path] if isinstance(path, str) else list(path)
    fmt = format_hint or infer_format(paths[0])
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if fmt == "csv":
        header = params.pop("header", False)
        infer_schema = params.pop("infer_schema", False)
        if schema is not None and infer_schema:
            raise ValueError("cannot set both schema and infer_schema")
        reader = reader.option("header", str(bool(header)).lower())
        if schema is not None:
            reader = reader.schema(parse_schema(schema))
        elif infer_schema:
            reader = reader.option("inferSchema", "true")
    elif schema is not None:
        reader = reader.schema(parse_schema(schema))
    for k, v in params.items():
        reader = reader.option(k, v)
    df = getattr(reader, fmt)(*paths) if fmt in ("parquet", "csv", "json", "orc") else reader.format(fmt).load(paths)
    if columns is not None:
        if isinstance(columns, str):  # schema string: project + cast
            target = parse_schema(columns)
            df = df.select(*[df[f.name].cast(f.dataType).alias(f.name) for f in target.fields])
        else:
            df = df.select(*columns)
    return df


def save_df(
    df: DataFrame,
    path: str,
    format_hint: "str | None" = None,
    mode: str = "overwrite",
    partition_by: "list[str] | None" = None,
    force_single: bool = False,
    **params,
) -> None:
    fmt = format_hint or infer_format(path)
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    if mode not in ("overwrite", "append", "error", "ignore"):
        raise ValueError(f"unsupported save mode {mode!r}")
    if force_single:
        if partition_by:
            raise ValueError("force_single and partition_by are mutually exclusive")
        _save_single_file(df, path, fmt, mode, **params)
        return
    if partition_by:
        # cluster rows by partition value before writing: without this every
        # task writes a fragment into every partition directory — O(tasks ×
        # values) small files, the classic hive-partitioning anti-pattern
        # (at 1000 executors that is ~1000 files per value). Clustering on
        # the keys ALONE would cap write parallelism at the value count
        # (3 tasks for 3 flags — wrong for a huge value), so a bounded
        # deterministic salt rides along: ≤ files_per_partition files per
        # value AND value×salt write parallelism. No rand() — reruns
        # produce identical layouts.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        def hashable(dt: "T.DataType") -> bool:
            # xxhash64 rejects MapType anywhere in the tree
            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return hashable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(hashable(f.dataType) for f in dt.fields)
            return True

        explicit_layout = "files_per_partition" in params
        k = int(params.pop("files_per_partition", 8))
        # The clustering exchange is a FULL shuffle of the payload — worth it
        # only when the input is big enough that the direct write would
        # actually fragment. When the optimizer's (column-pruned, pre-
        # execution, no job) size estimate says the whole frame fits in k
        # target-size files, the direct write's file count is already
        # bounded by its scan/shuffle task count — which for an input this
        # small is of the same order as k — so the shuffle buys nothing.
        # The bound scales with DATA (estimate grows 100 TB-ward → always
        # cluster), not with the local core count. Unknown estimates come
        # back as 8 EiB and keep the clustered path — fail-safe. An EXPLICIT
        # files_per_partition is a layout request (compact_dataset sizes its
        # output through it) and always clusters.
        threshold = int(params.pop("cluster_threshold_bytes", k * (128 << 20)))
        try:
            est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:  # noqa: BLE001 - estimate is best-effort
            est_bytes = None
        if explicit_layout or est_bytes is None or est_bytes > threshold:
            exprs = [df[c] for c in partition_by]
            salt_cols = [f.name for f in df.schema.fields if hashable(f.dataType)]
            if k > 1 and salt_cols:
                salt = F.pmod(F.xxhash64(*[df[c] for c in salt_cols]), F.lit(k))
                exprs.append(salt)
            df = df.repartition(*exprs)
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", str(bool(params.pop("header", False))).lower())
    for k, v in params.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path) if fmt in ("parquet", "csv", "json", "orc") else writer.format(fmt).save(path)


def _save_single_file(df: DataFrame, path: str, fmt: str, mode: str, **params) -> None:
    if mode in ("error", "ignore") and os.path.exists(path):
        if mode == "ignore":
            return
        raise FileExistsError(path)
    tmp = tempfile.mkdtemp(prefix="fugue_spark_single_")
    try:
        out_dir = os.path.join(tmp, "out")
        writer = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", str(bool(params.pop("header", False))).lower())
        for k, v in params.items():
            writer = writer.option(k, v)
        getattr(writer, fmt)(out_dir)
        parts = _glob.glob(os.path.join(out_dir, "part-*"))
        if len(parts) != 1:
            raise RuntimeError(f"expected one part file, found {parts}")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if os.path.isdir(path):
            shutil.rmtree(path)
        shutil.move(parts[0], path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
