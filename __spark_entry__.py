"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()``/``oracle_sql()`` feed the
per-round DuckDB correctness gate. All real definitions live in
``fugue_spark.benchmarks`` so the bench harness and tests share them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fugue_spark.benchmarks import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
