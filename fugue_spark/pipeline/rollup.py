"""Hypertable-style time rollups: multi-granularity bucketed aggregates
over an event stream — the batch form of a continuous aggregate
(TimescaleDB's hypertable rollup, Druid's granularity spec).

One pass per granularity, each a single map-side-combined groupBy on
(bucket, keys). At 100 TB the partial aggregation happens before the
exchange, so the shuffle carries one row per (bucket, key) per input
partition — not the events. Coarser granularities could be re-aggregated
from finer ones (true continuous-aggregate style); that variant is
``from_finest=True``, which aggregates the finest rollup instead of
rescanning the raw events for each level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup"]

# supported granularities, finest -> coarsest (date_trunc units)
_UNITS = ["minute", "hour", "day", "week", "month", "year"]


def _nests(coarse: str, fine: str) -> bool:
    """True iff every ``fine`` bucket lies wholly inside one ``coarse``
    bucket — i.e. re-aggregating ``coarse`` from ``fine`` rollups is exact.

    ISO weeks straddle month/year boundaries, so 'week' only nests upward
    into nothing: month/year derived from week buckets would misattribute
    the straddling week's events to the month of its Monday. Every other
    pair in _UNITS nests (minute⊂hour⊂day⊂{week,month⊂year}).
    """
    if fine == "week":
        return False
    return _UNITS.index(coarse) > _UNITS.index(fine)


def time_rollup(
    df: DataFrame,
    ts_col: str,
    granularities: "list[str]",
    by: "str | list[str] | None" = None,
    value_col: "str | None" = None,
    from_finest: bool = False,
) -> DataFrame:
    """Aggregate events into one row per (granularity, bucket, keys):
    ``n`` events, and when ``value_col`` is given ``value_cents``
    (integer-scaled sum — cross-engine exact) + ``value_max_cents``.

    ``from_finest=True`` computes only the finest level from the raw
    events and derives every coarser level from it — count/sum/max are
    all re-aggregable, so results are identical while the raw data is
    scanned ONCE (the continuous-aggregate maintenance trade).
    Output: granularity, bucket_start (string, engine-portable), keys…,
    n, [value_cents, value_max_cents]; finest-first ordering is the
    caller's job.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    gs = [g.lower() for g in granularities]
    bad = [g for g in gs if g not in _UNITS]
    if bad:
        raise ValueError(f"unsupported granularities {bad}; pick from {_UNITS}")
    gs = sorted(set(gs), key=_UNITS.index)  # finest first

    def aggs(n_col: F.Column, sum_col, max_col):
        out = [n_col.alias("n")]
        if value_col is not None:
            out += [sum_col.alias("value_cents"), max_col.alias("value_max_cents")]
        return out

    def level_from_raw(g: str) -> DataFrame:
        b = F.date_trunc(g, F.col(ts_col))
        gb = df.groupBy(b.alias("__b__"), *keys)
        cents = F.round(F.col(value_col) * 100).cast("long") if value_col else None
        agg = gb.agg(
            *aggs(
                F.count(F.lit(1)),
                F.sum(cents) if value_col else None,
                F.max(cents) if value_col else None,
            )
        )
        return agg.select(
            F.lit(g).alias("granularity"),
            F.date_format("__b__", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            *keys,
            "n",
            *(["value_cents", "value_max_cents"] if value_col else []),
        )

    finest = level_from_raw(gs[0])
    levels = [finest]
    if from_finest and len(gs) > 1:
        # re-aggregate the finest level: bucket_start is a string, so parse
        # it back once — count/sum are summable, max is maxable. Levels that
        # do NOT nest in the finest bucket (month/year over a 'week' finest:
        # ISO weeks straddle month boundaries) silently misattribute events
        # if derived this way, so they fall back to a raw scan instead.
        base = finest.withColumn("__ts__", F.to_timestamp("bucket_start"))
        for g in gs[1:]:
            if not _nests(g, gs[0]):
                levels.append(level_from_raw(g))
                continue
            b = F.date_trunc(g, F.col("__ts__"))
            gb = base.groupBy(b.alias("__b__"), *keys)
            agg = gb.agg(
                *aggs(
                    F.sum("n"),
                    F.sum("value_cents") if value_col else None,
                    F.max("value_max_cents") if value_col else None,
                )
            )
            levels.append(
                agg.select(
                    F.lit(g).alias("granularity"),
                    F.date_format("__b__", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
                    *keys,
                    "n",
                    *(["value_cents", "value_max_cents"] if value_col else []),
                )
            )
    else:
        for g in gs[1:]:
            levels.append(level_from_raw(g))

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
