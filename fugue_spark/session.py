"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every default here is chosen for a
multi-executor cluster at large scale: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow exchange for the pandas-UDF path, and
UTC session time so timestamp semantics are deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "configure_builder"]

_DEFAULTS = {
    # AQE: coalesce small shuffle partitions, split skewed ones, re-plan joins
    # at runtime — essential at 100 TB where static planning guesses wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for createDataFrame/toPandas and all pandas-UDF exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 64k-row Arrow batches (Spark default 10k): the map engine consumes
    # whole partitions, so fewer batch boundaries = less IPC overhead
    # (−10-17% on arrow-path transforms at sf1). Tradeoff: per-batch memory
    # is row-count-bounded — lower this for very wide rows (large media
    # blobs) on memory-tight executors.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Deterministic timestamps regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Self-describing parquet timestamps.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Parquet TIMESTAMP(NANOS) (e.g. pandas-written ns data) is otherwise an
    # analysis error; read it as a long of nanoseconds and convert at load.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # managed tables (saveAsTable / bucketing) live outside the repo
    "spark.sql.warehouse.dir": "/tmp/fugue_spark_warehouse",
}


def configure_builder(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply this engine's defaults to an existing builder."""
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    return builder


def get_spark(
    app_name: str = "fugue_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    **conf: str,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset, so unit
    tests and the bench harness share one code path. On a real cluster the
    caller passes master/None and lets spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    builder = configure_builder(builder)
    if shuffle_partitions is None:
        # local mode: match core count, not the 200 default
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in conf.items():
        builder = builder.config(k.replace("__", "."), v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
