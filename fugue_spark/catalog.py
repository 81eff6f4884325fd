"""Catalog-table operations (reference: SQLEngine.table_exists/load_table/
save_table, fugue/execution/execution_engine.py:240-274) plus Spark-native
bucketing — the at-scale feature the catalog unlocks: two tables bucketed
on the same key join WITHOUT a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["table_exists", "load_table", "save_table"]


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def load_table(spark: SparkSession, name: str) -> DataFrame:
    if not table_exists(spark, name):
        raise ValueError(f"table {name!r} does not exist")
    return spark.table(name)


def save_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    format: str = "parquet",
    partition_by: "list[str] | None" = None,
    bucket_by: "list[str] | None" = None,
    num_buckets: int = 0,
) -> None:
    """Persist as a managed table. ``bucket_by`` pre-hashes rows into
    ``num_buckets`` files per partition keyed on the bucket columns; later
    equi-joins/aggregations on those columns skip the exchange entirely
    (sort-merge join with both sides pre-bucketed: zero shuffle)."""
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        # a location left behind by a previous session's metastore still
        # blocks managed-table creation — clear it explicitly
        import os
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), name.lower())
        if os.path.exists(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.format(format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        if num_buckets <= 0:
            raise ValueError("bucket_by requires num_buckets > 0")
        writer = writer.bucketBy(num_buckets, *bucket_by).sortBy(*bucket_by)
    writer.saveAsTable(name)
