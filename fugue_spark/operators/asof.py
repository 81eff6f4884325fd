"""As-of (nearest-event) join — the time-series primitive Spark lacks as a
built-in (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

For each left row, attach the single right row with the LARGEST right
timestamp ≤ the left timestamp (``direction='backward'``, the default) or
the SMALLEST right timestamp ≥ it (``'forward'``), per key group.

Scale shape — the union-window plan, not a range join: a range-condition
join (``l.k = r.k AND r.ts <= l.ts``) explodes to every (left, right)
pair per key before picking the max; at 100 TB that is quadratic in the
events-per-key. Instead both sides are tagged and unioned, then ONE
exchange partitions by key and a running ``last(..., ignorenulls) OVER
(ORDER BY ts, side)`` carries each right row's payload forward onto the
left rows that follow it — O(n log n) sort per partition, exchange carries
the projected columns only. Equal timestamps match (right sorts before
left at the same instant), mirroring ASOF's inclusive bound.

``tolerance`` (seconds) optionally voids matches older than the bound —
pandas ``merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: "str | list[str]",
    direction: str = "backward",
    tolerance_s: "float | None" = None,
    how: str = "left",
    right_prefix: str = "r_",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` within key
    group(s) ``by``.

    Output: every left column, plus each right column (except the keys)
    prefixed with ``right_prefix``. ``how='inner'`` drops left rows with
    no match; ``'left'`` keeps them with nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    keys = [by] if isinstance(by, str) else list(by)
    for k in keys + [on]:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"column {k!r} must exist on both sides")
    payload = [c for c in right.columns if c not in keys and c != on]
    overlap = [right_prefix + c for c in payload + [on] if right_prefix + c in left.columns]
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {overlap}")

    # tagged union over the superset schema: left rows carry a null right-
    # payload STRUCT and vice versa. The whole right row travels as ONE
    # struct so the window picks an actual row — carrying each payload
    # column independently would splice fields from different right rows
    # whenever a payload value is NULL (last(ignorenulls) skips it but not
    # the row's other columns). side orders right BEFORE left at equal ts
    # so the inclusive (ts_r <= ts_l) bound holds.
    lcols = [c for c in left.columns]
    r_struct = F.struct(
        F.col(on).alias("__ts__"), *[F.col(c).alias(c) for c in payload]
    )
    r_struct_type = (
        right.select(r_struct.alias("__r__")).schema["__r__"].dataType
    )
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("__r__"),
        F.lit(1).alias("__side__"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys and c != on],
        r_struct.alias("__r__"),
        F.lit(0).alias("__side__"),
    ).select(*lcols, "__r__", "__side__")

    u = l_tag.unionByName(r_tag)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last("__r__", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__side__").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = F.first("__r__", ignorenulls=True).over(w)

    matched = u.select(
        *lcols, "__side__", picked.alias("__m__")
    ).filter(F.col("__side__") == 1)

    if tolerance_s is not None:
        delta = F.abs(
            F.col(on).cast("double") - F.col("__m__")["__ts__"].cast("double")
        )
        within = F.col("__m__").isNotNull() & (delta <= float(tolerance_s))
        matched = matched.select(
            *lcols, F.when(within, F.col("__m__")).alias("__m__")
        )

    out = matched.select(
        *lcols,
        *[F.col("__m__")[c].alias(f"{right_prefix}{c}") for c in payload],
        F.col("__m__")["__ts__"].alias(f"{right_prefix}{on}"),
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{on}").isNotNull())
    return out
