"""Batch sessionization: gaps-and-islands over event time.

The batch twin of streaming session windows (fugue_spark.streaming
session_agg): assign every event a per-key session index, where a new
session starts after ``gap_seconds`` of silence. Log/clickstream
sessionization is a standard step when turning interaction logs into
training examples.

Scale shape: ONE shuffle keyed on ``by`` (the window exchange), a lag +
running-sum scan inside each partition ordered by (ts, tiebreak), and an
optional per-session aggregation riding the same exchange. State per row
is O(1); no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    by: "list[str] | str" = "user_id",
    tiebreak_col: "str | None" = "event_id",
) -> DataFrame:
    """Add ``session_idx`` (0-based per ``by`` key): a new session starts
    when the time since the previous event exceeds ``gap_seconds``.

    The order within a key is (ts, tiebreak) — pass a unique
    ``tiebreak_col`` so simultaneous events get a deterministic order
    (engine-reproducible; ties on a non-total order would be
    engine-arbitrary). Timestamps compare at microsecond precision.
    """
    keys = [by] if isinstance(by, str) else list(by)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | (us - prev_us > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    flagged = df.withColumn("__new__", new_session)
    return flagged.withColumn(
        "session_idx",
        (F.sum("__new__").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "long"
        ),
    ).drop("__new__")


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    by: "list[str] | str" = "user_id",
    tiebreak_col: "str | None" = "event_id",
) -> DataFrame:
    """Per-session summary: ``(by..., session_idx, n_events,
    session_start, session_end, duration_sec)`` — duration as whole
    seconds (floor of the microsecond span; integer-exact everywhere)."""
    keys = [by] if isinstance(by, str) else list(by)
    s = sessionize(df, ts_col, gap_seconds, by=keys, tiebreak_col=tiebreak_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(*keys, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.floor((F.max(us) - F.min(us)) / 1_000_000).cast("long").alias(
                "duration_sec"
            ),
        )
    )
