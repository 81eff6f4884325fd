"""Small-files compaction: rewrite a dataset into size-bounded files.

The operational tool every long-lived 100 TB pipeline needs: streaming
ingest, per-executor writes, and hive partitioning all accumulate
thousands of tiny files, and scan cost at that point is dominated by
file-open/footer overhead rather than bytes. ``compact_dataset`` rewrites
a dataset directory so each output file lands near ``target_file_bytes``.

No reference counterpart (beyond-reference operator, same family as the
`save_df` files-per-partition policy it composes with). Design notes:

* input size comes from the Hadoop FileSystem API (via the JVM gateway),
  not ``os.walk`` — the same code path works on HDFS/S3A/local, which is
  what a real cluster compaction job sees;
* the output file count is ``ceil(data_bytes / target_file_bytes)`` —
  bytes on disk are already compressed and the rewrite keeps the format
  (or converts, when ``out_format`` differs), so on-disk size is the
  right estimator;
* ``shuffle=True`` (default) repartitions round-robin for evenly sized
  files; ``shuffle=False`` coalesces — no exchange, but file sizes then
  inherit input skew (coalesce only merges, so it cannot grow the
  partition count);
* with ``partition_by``, the per-value file bound is derived from the
  global target: one cheap column-pruned distinct-count job sizes
  ``files_per_partition`` so the TOTAL file count still tracks
  ``target_file_bytes`` (save_df's salted clustering does the layout);
* compacting a path onto itself is refused — Spark reads lazily, so an
  in-place overwrite would destroy the input mid-scan.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from fugue_spark.sources import infer_format, load_df, save_df

__all__ = ["compact_dataset", "dataset_file_stats"]


def dataset_file_stats(spark: SparkSession, path: str) -> "dict[str, int]":
    """Data-file count and total bytes under ``path`` (recursive), via the
    Hadoop FileSystem API so HDFS/S3A/local all answer the same way.
    Hidden files (``_SUCCESS``, ``.crc`` …) are excluded — they are not
    data and a compaction must not count them."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise FileNotFoundError(path)
    n_files = 0
    n_bytes = 0
    if fs.getFileStatus(jpath).isFile():
        return {"n_files": 1, "n_bytes": int(fs.getFileStatus(jpath).getLen())}
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n_files += 1
        n_bytes += int(st.getLen())
    return {"n_files": n_files, "n_bytes": n_bytes}


def compact_dataset(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    format_hint: "str | None" = None,
    out_format: "str | None" = None,
    mode: str = "overwrite",
    partition_by: "list[str] | None" = None,
    shuffle: bool = True,
    **params,
) -> "dict[str, int]":
    """Rewrite the dataset at ``in_path`` into ``out_path`` with files
    sized near ``target_file_bytes``. Returns before/after stats:
    ``{in_files, in_bytes, out_files, out_bytes, requested_files}``."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    in_fmt = format_hint or infer_format(in_path)
    if out_format:
        out_fmt = out_format
    else:
        # dotted basenames with an unknown extension (out.2024_01) fall
        # back to the input format instead of failing the inference
        try:
            out_fmt = infer_format(out_path)
        except ValueError:
            out_fmt = in_fmt
    # string-normalized containment check — a true same-FS check needs
    # resolved URIs, but the failure modes are severe enough to hard-fail
    # on what IS checkable: identical paths clobber the lazy input, and a
    # NESTED output re-enters the input's recursive scan on the next run
    # (the corpus plus its own compacted copy — every row duplicated)
    a, b = in_path.rstrip("/") + "/", out_path.rstrip("/") + "/"
    if a == b or b.startswith(a) or a.startswith(b):
        raise ValueError(
            "compact_dataset output must not be the input or nested "
            "inside/around it (the scan is lazy and recursive); write to "
            "a sibling path, then swap"
        )
    before = dataset_file_stats(spark, in_path)
    n_out = max(1, math.ceil(before["n_bytes"] / target_file_bytes))
    df = load_df(spark, in_path, format_hint=in_fmt)
    if partition_by:
        # size the per-value bound from the global target: one
        # column-pruned distinct-count job (the partition columns only —
        # parquet reads just those column chunks)
        n_values = df.select(*partition_by).distinct().count()
        save_df(
            df,
            out_path,
            format_hint=out_fmt,
            mode=mode,
            partition_by=partition_by,
            files_per_partition=max(1, math.ceil(n_out / max(1, n_values))),
            **params,
        )
    else:
        df = df.repartition(n_out) if shuffle else df.coalesce(n_out)
        save_df(df, out_path, format_hint=out_fmt, mode=mode, **params)
    after = dataset_file_stats(spark, out_path)
    return {
        "in_files": before["n_files"],
        "in_bytes": before["n_bytes"],
        "out_files": after["n_files"],
        "out_bytes": after["n_bytes"],
        "requested_files": n_out,
    }
