"""Skew-hardening proof for the map engine (VERDICT r7 item 5).

One key holding 50% of all rows through ``transform(partition={"by":...})``
must (a) complete within a bounded multiple of the uniform-keys case and
(b) leave plan evidence of why: the pandas path hash-partitions on the
keys so every OTHER key parallelizes independently of the hot one (wall ≈
max(hot-group cost, rest/parallelism)); the compiled path does map-side
partial aggregation, so the hot key's rows combine before the exchange
and skew never reaches the shuffle at all.

Measured numbers land in SCALE.md ("skew" row) — this test is the
measurement, re-run every round.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from fugue_spark.plans import physical_plan
from fugue_spark.transform import transform

N = 200_000
SCHEMA = "k:long,n:long,s:double"


def _make_sum_per_group():
    # defined per-call so cloudpickle ships it by VALUE (a module-level test
    # function is pickled by reference, which Spark workers cannot import)
    def _sum_per_group(pdf):
        return {"k": pdf.k.iloc[0], "n": pdf.shape[0], "s": pdf.v.sum()}

    return _sum_per_group


def _skewed(spark):
    # key 0 holds 50% of rows; 200 other keys share the rest uniformly
    hot = spark.range(N // 2).select(
        F.lit(0).cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    rest = spark.range(N // 2).select(
        (F.col("id") % 200 + 1).cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    return hot.unionByName(rest)


def _uniform(spark):
    return spark.range(N).select(
        (F.col("id") % 201).cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def _run_pandas_path(df):
    out = transform(
        df, _make_sum_per_group(), schema=SCHEMA, partition={"by": ["k"]},
        compile=False,
    )
    out.write.format("noop").mode("overwrite").save()
    return out


def _best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def test_skew_hot_key_bounded_on_pandas_path(spark):
    skewed = _skewed(spark).persist()
    uniform = _uniform(spark).persist()
    try:
        assert skewed.count() == uniform.count() == N
        hot_share = skewed.filter("k = 0").count() / N
        assert hot_share == pytest.approx(0.5)

        # warm both paths (codegen + python workers) before timing
        _run_pandas_path(skewed)
        _run_pandas_path(uniform)

        t_skew = _best_of(lambda: _run_pandas_path(skewed))
        t_uni = _best_of(lambda: _run_pandas_path(uniform))
        # theoretical wall ratio at local[4] is ~2x (one task carries 50%
        # instead of 25%); allow generous headroom for this box's measured
        # 2-5x CPU spikes plus a constant for fixed job overhead
        assert t_skew <= 6.0 * t_uni + 0.5, (t_skew, t_uni)

        # value sanity: the hot group really went through one pandas call
        got = {
            r.k: (r.n, r.s)
            for r in transform(
                skewed, _make_sum_per_group(), schema=SCHEMA,
                partition={"by": ["k"]}, compile=False,
            ).collect()
        }
        assert got[0][0] == N // 2
        assert len(got) == 201
    finally:
        skewed.unpersist()
        uniform.unpersist()


def test_skew_plan_evidence(spark):
    skewed = _skewed(spark)

    # pandas path: ONE hash exchange on the keys — every non-hot key
    # parallelizes independently of the hot one
    plan = physical_plan(
        transform(
            skewed, _make_sum_per_group(), schema=SCHEMA,
            partition={"by": ["k"]}, compile=False,
        ),
        "simple",
    )
    assert "hashpartitioning" in plan, plan
    assert plan.count("Exchange") == 1, plan

    # compiled (default) path: partial HashAggregate BEFORE the exchange —
    # the hot key's rows combine map-side, so the shuffle carries tiny
    # partial states and skew cannot concentrate data on one reducer
    auto = physical_plan(
        transform(
            skewed, _make_sum_per_group(), schema=SCHEMA, partition={"by": ["k"]}
        ),
        "simple",
    )
    assert "MapInArrow" not in auto and "FlatMapGroupsInPandas" not in auto, auto
    assert auto.count("HashAggregate") >= 2, auto
    exchange_pos = auto.find("Exchange")
    first_agg = auto.rfind("HashAggregate")
    assert first_agg > exchange_pos >= 0, auto  # partial agg below the exchange


# ---------------- cotransform (zip engine) under the same skew ----------------


def _make_pair_counts():
    def _pair_counts(cursor, left, right):
        return {
            "k": cursor["k"],
            "n_left": left.shape[0],
            "n_right": right.shape[0],
            "s": left.v.sum() + right.w.sum(),
        }

    return _pair_counts


def _skew_pair(spark, skewed: bool):
    left = (_skewed(spark) if skewed else _uniform(spark))
    right = left.select("k", F.col("v").alias("w"))
    return left, right


def test_skew_hot_key_bounded_on_cotransform(spark):
    """The zip engine's tagged union + ONE keyed exchange gives the same
    skew posture as the map engine: the hot key serializes only its own
    group; every other key parallelizes around it."""
    from fugue_spark.cotransform import cotransform

    def run(skewed: bool):
        left, right = _skew_pair(spark, skewed)
        out = cotransform(
            [left, right], _make_pair_counts(),
            schema="k:long,n_left:long,n_right:long,s:double",
            partition={"by": ["k"]}, compile=False,
        )
        out.write.format("noop").mode("overwrite").save()

    run(True); run(False)  # warm
    t_skew = _best_of(lambda: run(True))
    t_uni = _best_of(lambda: run(False))
    assert t_skew <= 6.0 * t_uni + 0.5, (t_skew, t_uni)

    # value sanity: hot group saw all its rows from BOTH sides in one call
    left, right = _skew_pair(spark, True)
    got = {
        r.k: (r.n_left, r.n_right)
        for r in cotransform(
            [left, right], _make_pair_counts(),
            schema="k:long,n_left:long,n_right:long,s:double",
            partition={"by": ["k"]}, compile=False,
        ).collect()
    }
    assert got[0] == (N // 2, N // 2)
    assert len(got) == 201


def test_skew_cotransform_plan_evidence(spark):
    """ONE exchange total for the zip (tagged union shuffles once on the
    keys — not one exchange per side), pandas stage above it."""
    from fugue_spark.cotransform import cotransform

    left, right = _skew_pair(spark, True)
    plan = physical_plan(
        cotransform(
            [left, right], _make_pair_counts(),
            schema="k:long,n_left:long,n_right:long,s:double",
            partition={"by": ["k"]}, compile=False,
        ),
        "simple",
    )
    assert "hashpartitioning" in plan, plan
    assert plan.count("Exchange") == 1, plan
