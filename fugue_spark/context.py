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

__all__ = ["engine_context", "current_spark", "raw_sql"]

_LOCAL = threading.local()


@contextmanager
def engine_context(spark: "SparkSession | None" = None):
    if spark is None:
        from fugue_spark.session import get_spark

        spark = get_spark()
    stack = getattr(_LOCAL, "stack", None)
    if stack is None:
        stack = _LOCAL.stack = []
    stack.append(spark)
    try:
        yield spark
    finally:
        stack.pop()


def current_spark() -> SparkSession:
    stack = getattr(_LOCAL, "stack", None)
    if stack:
        return stack[-1]
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from fugue_spark.session import get_spark

    return get_spark()


def raw_sql(*parts: "str | DataFrame", spark: "SparkSession | None" = None) -> DataFrame:
    """Reference ``fa.raw_sql``: interleave SQL text with dataframes —
    each frame becomes a temp view spliced in by name.

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
    return spark.sql(" ".join(pieces))
