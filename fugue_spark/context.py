"""Engine-context plumbing (reference shape: fugue/execution/api.py
engine_context / fugue/execution/factory.py — collapsed to the only engine
there is: a SparkSession).

``engine_context(spark)`` scopes a default session; ``current_spark()``
resolves context → active session → new session, so APIs can omit the
explicit handle exactly like the reference's ``fa.*`` functions.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "engine_context",
    "current_spark",
    "raw_sql",
    "set_global_engine",
    "clear_global_engine",
    "get_context_engine",
    "run_engine_function",
]

_LOCAL = threading.local()
# module-level default engine; a plain variable so reads and writes are
# atomic under the GIL (a clear-then-append list would race with readers)
_GLOBAL_ENGINE: "SparkSession | None" = None


@contextmanager
def engine_context(spark: "SparkSession | None" = None):
    if spark is None:
        # inherit the currently-resolved engine (global/context/active)
        # rather than jumping straight to getOrCreate
        spark = current_spark()
    stack = getattr(_LOCAL, "stack", None)
    if stack is None:
        stack = _LOCAL.stack = []
    stack.append(spark)
    try:
        yield spark
    finally:
        stack.pop()


def current_spark() -> SparkSession:
    """Context engine > global engine > active session > new session — the
    reference's resolution order (fugue/execution/factory.py), with the
    SparkSession as the only engine kind."""
    stack = getattr(_LOCAL, "stack", None)
    if stack:
        return stack[-1]
    if _GLOBAL_ENGINE is not None:
        return _GLOBAL_ENGINE
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from fugue_spark.session import get_spark

    return get_spark()


def set_global_engine(spark: "SparkSession | None" = None) -> SparkSession:
    """Make ``spark`` the process-wide default engine (reference
    fugue/execution/api.py set_global_engine). Context engines set via
    :func:`engine_context` still take precedence, matching the reference's
    resolution order."""
    global _GLOBAL_ENGINE
    if spark is None:
        from fugue_spark.session import get_spark

        spark = get_spark()
    _GLOBAL_ENGINE = spark
    return spark


def clear_global_engine() -> None:
    """Unset the process-wide default engine (reference
    fugue/execution/api.py clear_global_engine)."""
    global _GLOBAL_ENGINE
    _GLOBAL_ENGINE = None


def get_context_engine() -> SparkSession:
    """The engine that would serve an engine-less API call right now
    (reference fugue/execution/api.py get_context_engine): context >
    global > active > new."""
    return current_spark()


def run_engine_function(func, engine: "SparkSession | None" = None):
    """Run ``func(spark)`` under the resolved engine (reference
    fugue/execution/api.py run_engine_function, minus the multi-backend
    conversion knobs — the result is returned as-is because the engine
    dataframe IS the Spark DataFrame)."""
    spark = engine if engine is not None else current_spark()
    with engine_context(spark):
        return func(spark)


def raw_sql(
    *parts: "str | DataFrame",
    spark: "SparkSession | None" = None,
    dialect: "str | None" = None,
) -> DataFrame:
    """Reference ``fa.raw_sql``: interleave SQL text with dataframes —
    each frame becomes a temp view spliced in by name. ``dialect``
    transpiles the assembled statement to Spark SQL first (reference
    StructuredRawSQL dialect, fugue/collections/sql.py — optional
    sqlglot dependency, clean error when absent).

    >>> raw_sql("SELECT a FROM", df, "WHERE a > 1")
    """
    spark = spark or current_spark()
    pieces: list[str] = []
    for i, p in enumerate(parts):
        if isinstance(p, DataFrame):
            name = f"__fugue_raw_{i}__"
            p.createOrReplaceTempView(name)
            pieces.append(name)
        else:
            pieces.append(str(p))
    sql = " ".join(pieces)
    if dialect is not None:
        from fugue_spark.sql import transpile_sql

        sql = transpile_sql(sql, dialect)
    return spark.sql(sql)
