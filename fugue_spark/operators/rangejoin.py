"""Range (interval-containment) join — point-in-interval and
interval-overlap joins without the cartesian blowup.

Spark's optimizer turns ``l.k = r.k AND l.x BETWEEN r.lo AND r.hi`` into a
join on the equality key with the range as a post-filter — fine — but with
NO equality key (or a low-cardinality one) it degenerates to
BroadcastNestedLoopJoin: every (point, interval) pair is tested, O(n·m).
The standard scale fix implemented here is bucketing: pick a bin width,
map each point to one bin and EXPLODE each interval over the bins it
covers, equi-join on (key…, bin) — only co-binned pairs materialize — and
re-check the exact predicate. Cost is linear in points + total covered
bins; the ``max_bins_per_interval`` guard refuses degenerate intervals
that would cover unbounded bin ranges (an interval spanning the whole
domain belongs on the broadcast side of a plain join, not in a range
join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: "str | list[str] | None" = None,
    bin_width: "float | None" = None,
    how: str = "inner",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (and equal ``by`` keys, if given).

    ``bin_width`` defaults to a probe of the median interval span (one
    bounded aggregation job) — intervals then cover ~2 bins each. Numeric
    or timestamp columns both work (timestamps are binned on epoch
    seconds). ``how='left'`` keeps points with no interval, null-extended;
    duplicate point rows are preserved in both branches (a matched
    duplicate emits one output row per copy per matching interval).

    Output: all point columns + all interval columns (caller pre-renames
    collisions; colliding names raise).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    clash = [
        c
        for c in intervals.columns
        if c in points.columns and c not in keys
    ]
    if clash:
        raise ValueError(f"column collision between sides: {clash} — rename first")
    reserved = [
        c
        for c in ("__bin__", "__nb__", "__bins__")
        if c in points.columns or c in intervals.columns
    ]
    if reserved:
        raise ValueError(
            f"columns {reserved} are reserved internal names of range_join — rename them first"
        )

    def num(side: DataFrame, c: str) -> F.Column:
        from pyspark.sql import types as T

        dt = side.schema[c].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    if bin_width is None:
        # bounded probe: median span sizes the bins so a typical interval
        # covers ~2 bins (same stats-then-plan trade as AQE)
        row = intervals.select(
            F.percentile_approx(num(intervals, hi_col) - num(intervals, lo_col), 0.5).alias("m")
        ).first()
        bin_width = float(row["m"] or 0) or 1.0
        bin_width = max(bin_width, 1e-9)

    p = points.withColumn("__bin__", F.floor(num(points, point_col) / F.lit(float(bin_width))).cast("long"))
    lo_b = F.floor(num(intervals, lo_col) / F.lit(float(bin_width))).cast("long")
    hi_b = F.floor(num(intervals, hi_col) / F.lit(float(bin_width))).cast("long")
    n_bins = hi_b - lo_b + 1
    guarded = intervals.withColumn("__nb__", n_bins).withColumn(
        "__bins__",
        F.when(
            (F.col("__nb__") > 0) & (F.col("__nb__") <= max_bins_per_interval),
            F.sequence(lo_b, hi_b),
        ),
    )
    # fail loudly on degenerate intervals instead of silently dropping or
    # exploding them — assert inside the plan, no extra driver action.
    # NULL lo/hi (open-ended/dirty interval rows) make __nb__ NULL: the
    # BETWEEN predicate would match nothing for them, so they pass through
    # to the __nb__ > 0 filter below and drop — NOT the error branch.
    checked = guarded.withColumn(
        "__bins__",
        F.when(
            F.col("__nb__").isNull() | (F.col("__nb__") <= max_bins_per_interval),
            F.col("__bins__"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"range_join: interval covers more than {max_bins_per_interval}"
                        " bins — widen bin_width or pre-split the interval (row lo="
                    ),
                    F.col(lo_col).cast("string"),
                    F.lit(" hi="),
                    F.col(hi_col).cast("string"),
                    F.lit(")"),
                )
            ).cast("array<long>")
        ),
    )
    i = checked.filter(F.col("__nb__") > 0).withColumn(
        "__bin__", F.explode("__bins__")
    ).drop("__bins__", "__nb__")

    on = keys + ["__bin__"]
    exact = (num(points, point_col) >= num(intervals, lo_col)) & (
        num(points, point_col) <= num(intervals, hi_col)
    )
    joined = p.join(i, on=on, how="inner").filter(exact).drop("__bin__")
    if how == "inner":
        return joined
    # left: anti-join the matched point rows back — points may legitimately
    # match several intervals, so a plain left join + filter can't express
    # "keep unmatched"; re-derive them instead. NULL-SAFE equality on every
    # column: plain `on=cols` compares NULL=NULL as unknown, which would
    # emit a matched row carrying any NULL column a second time as
    # "unmatched"
    icols = [c for c in intervals.columns if c not in keys]
    matched_keys = joined.select(*points.columns).distinct()
    p_al, m_al = points.alias("__rjp__"), matched_keys.alias("__rjm__")
    cond = None
    for c in points.columns:
        eq = F.col(f"__rjp__.{c}").eqNullSafe(F.col(f"__rjm__.{c}"))
        cond = eq if cond is None else (cond & eq)
    unmatched = p_al.join(m_al, on=cond, how="left_anti")
    from pyspark.sql import types as T  # noqa: F401

    null_ext = unmatched.select(
        *points.columns,
        *[
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in icols
        ],
    )
    return joined.select(*points.columns, *icols).unionByName(null_ext)
