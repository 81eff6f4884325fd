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


_RESERVED = ("__r__", "__side__", "__m__", "__tb__")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: "str | list[str]",
    direction: str = "backward",
    tolerance_s: "float | None" = None,
    how: str = "left",
    right_prefix: str = "r_",
    tiebreak_col: "str | None" = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` within key
    group(s) ``by``.

    Output: every left column, plus each right column (except the keys)
    prefixed with ``right_prefix``. ``how='inner'`` drops left rows with
    no match; ``'left'`` keeps them with nulls.

    Right rows with a NULL ``on`` timestamp are dropped before matching
    (they can't be "nearest" to anything; pandas ``merge_asof`` raises on
    them). Left rows with NULL ``on`` never match and come through
    null-extended under ``how='left'``.

    Ties: when several right rows share the same (key, ``on``) value, pass
    ``tiebreak_col`` (a right-side column, e.g. a monotonic id) to make the
    pick deterministic, mirroring pandas ``merge_asof`` over a stable sort:
    ``backward`` takes the LARGEST tiebreak (the last row ≤ ts),
    ``forward`` the SMALLEST (the first row ≥ ts). Without it the pick
    among exact ties follows physical row order and may differ between
    runs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    keys = [by] if isinstance(by, str) else list(by)
    for k in keys + [on]:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"column {k!r} must exist on both sides")
    if tiebreak_col is not None and tiebreak_col not in right.columns:
        raise ValueError(f"tiebreak_col {tiebreak_col!r} must be a right-side column")
    reserved = [c for c in _RESERVED if c in left.columns or c in right.columns]
    if reserved:
        raise ValueError(
            f"columns {reserved} are reserved internal names of asof_join — rename them first"
        )
    payload = [c for c in right.columns if c not in keys and c != on]
    overlap = [right_prefix + c for c in payload + [on] if right_prefix + c in left.columns]
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {overlap}")
    # a NULL right timestamp would sort before every real event (asc
    # nulls-first) and hand early left rows a phantom payload — drop them
    right = right.filter(F.col(on).isNotNull())

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
    tb_r = F.col(tiebreak_col) if tiebreak_col is not None else F.lit(0)
    tb_type = (
        right.schema[tiebreak_col].dataType if tiebreak_col is not None else None
    )
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("__r__"),
        F.lit(1).alias("__side__"),
        (F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0)).alias("__tb__"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys and c != on],
        r_struct.alias("__r__"),
        F.lit(0).alias("__side__"),
        tb_r.alias("__tb__"),
    ).select(*lcols, "__r__", "__side__", "__tb__")

    u = l_tag.unionByName(r_tag)
    # __tb__ breaks exact (ts, side) ties among RIGHT rows deterministically,
    # mirroring pandas merge_asof over a stable sort: backward picks the
    # LAST row ≤ ts (last() over ascending __tb__ → max tiebreak wins) and
    # forward picks the FIRST row ≥ ts (first() over ascending __tb__ →
    # min tiebreak wins).
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__side__").asc(), F.col("__tb__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last("__r__", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("__side__").desc(), F.col("__tb__").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = F.first("__r__", ignorenulls=True).over(w)

    # a left row with NULL `on` has no position on the timeline — never a
    # match (under forward ordering it would otherwise grab the first event)
    picked = F.when(F.col(on).isNotNull(), picked)
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
